"""One-off probe: validate job time at several core counts on the bench
table (fresh JVM per point, full warm run + best-of-2 timed, same
estimator as bench.py). Prints one JSON line per point.

Usage: python tools/scaling_probe.py [cores ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import subprocess

    import bench
    from oblate_spark.session import get_spark

    spark = get_spark(cores=32, app_name="probe_build")
    path = bench.ensure_images(spark)
    spark.stop()

    cores_list = [int(c) for c in sys.argv[1:]] or [4, 16, 8, 32]
    for cores in cores_list:
        t0 = time.time()
        secs = bench.run_scaling_series(cores, path, 2)
        print(
            json.dumps(
                {
                    "cores": cores,
                    "secs": secs,
                    "thr": round(bench.N_IMAGES / min(secs), 1),
                    "wall": round(time.time() - t0, 1),
                }
            ),
            flush=True,
        )
        ctl_t0 = time.time()
        ctl = bench.mp_control_series(cores, path, 2)
        print(
            json.dumps(
                {
                    "ctl_cores": cores,
                    "ctl_secs": ctl,
                    "ctl_wall": round(time.time() - ctl_t0, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
