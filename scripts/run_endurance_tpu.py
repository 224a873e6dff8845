#!/usr/bin/env python
"""Run the 200k-step DNS endurance sentinel on the attached accelerator
and record the artifact (round-3 verdict #7: the TPU-gated
tests/test_endurance.py::test_endurance_dns_long_horizon had never
executed at full length — its Kahan-time, steady-KE and averaged Stage-F
gates were unexercised claims).

pytest's conftest pins the suite to CPU (where 200k steps would take
hours), so this driver imports the test module directly on the default
(TPU) backend and runs the full-length gate logic unchanged. Output goes
to stdout; tee it into artifacts/endurance_dns_200k.log.

Reference: tests/test_endurance_stability.cpp.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    import jax
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    if dev.platform == "cpu" and not os.environ.get(
            "CFDNN_ENDURANCE_STEPS"):
        print("refusing the full 200k-step horizon on CPU "
              "(set CFDNN_ENDURANCE_STEPS for a scaled smoke)")
        return 2
    import test_endurance
    t0 = time.time()
    test_endurance.test_endurance_dns_long_horizon()
    print(f"ENDURANCE OK in {time.time() - t0:.1f}s "
          f"(horizon={os.environ.get('CFDNN_ENDURANCE_STEPS', '200000')} "
          "steps)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
