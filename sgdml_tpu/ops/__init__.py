"""Math primitives: descriptors, Matern-5/2 Hessian kernel blocks, linalg."""
