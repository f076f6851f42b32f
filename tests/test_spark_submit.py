"""Launch-mode smoke (BASELINE.json north_star: "launched via
spark-submit --py-files"): package crawlfront/ as a zip, launch a real
spark-submit subprocess with ONLY the zip on the path (cwd is a temp
dir, so the repo itself is not importable), run one engine batch."""

from __future__ import annotations

import json
import os
import subprocess
from pathlib import Path

import pytest

DRIVER = """\
import json, sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("crawlfront-submit-smoke")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .getOrCreate()
)
from crawlfront.frontier import CrawlEngine  # resolved from the --py-files zip

eng = CrawlEngine(spark, sys.argv[1], sys.argv[2])
stats = eng.run(1)
print("SMOKE " + json.dumps(stats[0]))
spark.stop()
"""


@pytest.mark.slow
def test_spark_submit_pyfiles_smoke(tmp_path, fixture_dir):
    from bench import package_crawlfront_zip, spark_submit_path

    zip_path = package_crawlfront_zip(tmp_path)
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    spark_submit = spark_submit_path()
    assert spark_submit.exists()
    out = subprocess.run(
        [
            str(spark_submit),
            "--master", "local[2]",
            "--py-files", str(zip_path),
            str(driver),
            str(Path(fixture_dir).resolve()),
            str(tmp_path / "ck"),
        ],
        capture_output=True,
        text=True,
        cwd=tmp_path,  # repo NOT on sys.path: the zip must supply the package
        env={**os.environ, "PYTHONPATH": ""},
        timeout=480,
    )
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-3000:])
    smoke = [ln for ln in out.stdout.splitlines() if ln.startswith("SMOKE ")]
    assert smoke, out.stdout[-2000:]
    stats = json.loads(smoke[-1][6:])
    assert stats["batch_id"] == 1
    assert stats["fetched"] > 0
