"""Scaling sweeps for the conversion pipeline.

Default mode: core-count sweep (the engine's analog of the reference's
4/8/16-worker benchmark table, tests/test_live_ims_to_zarr.py:865-875
in the reference).

``--sizes`` mode: data-size / codec / transpose sweep at local[32] —
4 -> 17 -> 34 GB synthetic sources, gzip-1 vs no codec, with and
without the inner transpose codec — showing throughput holds as the
working set grows far past any single run's warm state.

Each configuration runs in a FRESH SparkSession (spark.master cannot
change within one JVM), so run this as a standalone script:

    python tools/scaling_bench.py            # core sweep
    python tools/scaling_bench.py --sizes    # size/codec sweep
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aind_exaspim_data_transformation_spark.config import ConvertJobSettings


def run_one(
    cpus: int,
    shape: str,
    codec: str = "gzip",
    transpose: str | None = None,
    label: dict | None = None,
) -> dict:
    # fresh JVM per configuration
    import subprocess

    code = f"""
import sys, time, tempfile, os, json
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from aind_exaspim_data_transformation_spark.session import get_spark
from aind_exaspim_data_transformation_spark.config import ConvertJobSettings
from aind_exaspim_data_transformation_spark.zarrio.pipeline import convert_to_zarr
spark = get_spark('scaling', cpus={cpus})
spark.sparkContext.setLogLevel('ERROR')
with tempfile.TemporaryDirectory() as tmp:
    convert_to_zarr(spark, ConvertJobSettings(
        input_source='synth://64,64,64,1',
        output_location=os.path.join(tmp, 'w.zarr'),
        chunk_shape=(32,32,32), shard_shape=(32,32,32)))
with tempfile.TemporaryDirectory() as tmp:
    t0 = time.monotonic()
    r = convert_to_zarr(spark, ConvertJobSettings(
        input_source='synth://{shape},1',
        output_location=os.path.join(tmp, 'b.zarr'),
        chunk_shape=(64,64,64), shard_shape=(128,128,128),
        translate_pyramid=True, codec={codec!r}, codec_level=1,
        transpose_order={transpose!r}))
    dt = time.monotonic() - t0
    br = r['stages'][0]['bytes_read']
    bw = r['stages'][0].get('bytes_written', 0)
    print('RESULT ' + json.dumps(dict(cpus={cpus}, seconds=round(dt,2),
        gb=round(br/1e9,3), gbps=round(br/1e9/dt,4),
        out_gb=round(bw/1e9,3))))
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line.removeprefix("RESULT "))
            result.update(label or {})
            return result
    raise RuntimeError(out.stderr[-2000:])


def main() -> None:
    if "--sizes" in sys.argv:
        # size/codec/transpose sweep at full cores; uint16 voxels
        shapes = {
            "4GB": "2048,1024,1024",
            "17GB": "2048,2048,2048",
            "34GB": "4096,2048,2048",
        }
        configs = [
            ("4GB", "gzip", None),
            ("17GB", "gzip", None),
            ("17GB", "none", None),
            ("17GB", "gzip", "F"),
            ("34GB", "gzip", None),
        ]
        results = [
            run_one(
                32, shapes[size], codec=codec, transpose=tr,
                label={"size": size, "codec": codec, "transpose": tr},
            )
            for size, codec, tr in configs
        ]
        print(json.dumps({
            "workload": "synth uint16 -> zarr v3, size/codec/transpose sweep",
            "results": results,
        }))
        return
    shape = "1024,512,512"  # 0.54 GB uint16
    results = [run_one(c, shape) for c in (4, 8, 16, 32)]
    print(json.dumps({"workload": f"synth {shape} uint16 -> zarr v3 gzip-1",
                      "results": results}))


if __name__ == "__main__":
    main()
