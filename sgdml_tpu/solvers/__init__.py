"""Linear-system solvers: closed-form Cholesky and Nystrom-preconditioned CG."""
