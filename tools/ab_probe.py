import time, sys
sys.path.insert(0, "/root/repo")
import bench
from oblate_spark.session import get_spark
spark = get_spark(cores=32, app_name="ab32")
from oblate_spark.operators.images import image_payload_report_from_files
path = bench.IMAGES_PATH
image_payload_report_from_files(spark, path).count()

import glob, multiprocessing as mp
files = sorted(glob.glob(path + "/*.parquet"))
ctx = mp.get_context("fork")
pool = ctx.Pool(32)
pool.map(bench._mp_control_work, files[:2])

for r in range(3):
    t0=time.time(); pool.map(bench._mp_control_work, files); c=time.time()-t0
    t0=time.time(); image_payload_report_from_files(spark, path).count(); s=time.time()-t0
    print(f"round{r}: mp_control={c:.2f}s spark_file_kernel={s:.2f}s", flush=True)
pool.close()
