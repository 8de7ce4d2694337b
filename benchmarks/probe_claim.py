"""5-second TPU claim-and-release probe (VERDICT r2 item 1c).

Run this near the end of a session to verify the single-tenant chip is
free: a clean claim + tiny execution + atexit release proves the driver's
end-of-round `python bench.py` will not spend minutes waiting on HBM held
by a dead process. Prints one line with the claim latency.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.time()
import jax  # noqa: E402

from aread_tpu.utils.device_cleanup import install  # noqa: E402

install()  # free HBM at exit so THIS probe never becomes the blocker
x = jax.numpy.ones((8,), jax.numpy.float32)
ok = float(x.sum()) == 8.0
print(f"tpu claim+exec in {time.time() - t0:.1f}s "
      f"(platform={jax.devices()[0].platform}) ok={ok}")
