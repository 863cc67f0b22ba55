"""Dev utility: run the aspirin bench with a watchdog stack dump."""

import faulthandler
import sys

sys.path.insert(0, '/root/repo')
faulthandler.dump_traceback_later(180, exit=True)
sys.argv = ['bench_large.py', 'aspirin']
exec(open('/root/repo/bench_large.py').read())
