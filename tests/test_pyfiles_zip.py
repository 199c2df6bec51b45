"""spark-submit --py-files contract: the whole package must import and
run from a zip archive (zipimport), with no __file__-relative resource
reads or filesystem assumptions — this is exactly how executors receive
the code on a real cluster (north rule: "ships as spark-submit
--py-files"). The test builds olake_spark.zip, then imports EVERY
submodule and exercises pure kernels in a clean subprocess whose only
path to the package is the zip."""

import subprocess
import sys
import zipfile
from pathlib import Path

import olake_spark

_PROBE = """
import sys, zipfile
zp = sys.argv[1]
sys.path.insert(0, zp)
# the repo itself must not be reachable except through the zip
sys.path = [p for p in sys.path if p != {repo!r} and p != ""]

import olake_spark
assert zp in olake_spark.__file__, olake_spark.__file__

mods = sorted(
    n.filename[:-3].replace("/", ".")
    for n in zipfile.ZipFile(zp).infolist()
    if n.filename.endswith(".py") and not n.filename.endswith("__init__.py")
)
for m in mods:
    __import__(m)

# pure kernels run from the zip (the executor-side reality of a UDF)
import numpy as np
from olake_spark.operators.bucketing import aspect_bucket_grid
assert (512, 512) in aspect_bucket_grid()
from olake_spark.functions.imagecodec import decode_image, encode_image
a = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
assert (decode_image(encode_image(a, "png")) == a).all()
from olake_spark.functions.zorder import hilbert_index
assert hilbert_index(
    np.array([[3, 5, 7]], dtype=np.uint64), 8
).shape == (1,)
print("ZIPOK", len(mods))
"""


def test_package_runs_from_zip(tmp_path):
    root = Path(olake_spark.__file__).parent
    repo = str(root.parent)
    zp = tmp_path / "olake_spark.zip"
    with zipfile.ZipFile(zp, "w") as z:
        for p in sorted(root.rglob("*.py")):
            z.write(p, f"olake_spark/{p.relative_to(root)}")
    out = subprocess.run(
        [sys.executable, "-c", _PROBE.format(repo=repo), str(zp)],
        capture_output=True, text=True, cwd=tmp_path, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "ZIPOK" in out.stdout
    # every module imported, not a cherry-picked subset
    n = int(out.stdout.split()[-1])
    assert n >= 40, n
