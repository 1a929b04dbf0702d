"""The committed spark-submit artifact must track the source tree.

Executors launched via the documented ``spark-submit --py-files
dist/ehr_ner_spark.zip`` contract import kernels from the zip; if the zip
lags the tree, workers run different code than the driver/oracles expect.
This gate fails the build whenever the zip and the package diverge by one
byte (rebuild with ``make dist``).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "ehr_ner_spark")
ZIP = os.path.join(REPO, "dist", "ehr_ner_spark.zip")


def _tree_files() -> dict[str, bytes]:
    out: dict[str, bytes] = {}
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for f in files:
            if not f.endswith(".py"):
                continue
            full = os.path.join(root, f)
            rel = os.path.join("ehr_ner_spark", os.path.relpath(full, PKG))
            with open(full, "rb") as fh:
                out[rel] = fh.read()
    return out


def test_dist_zip_matches_tree():
    assert os.path.exists(ZIP), "dist/ehr_ner_spark.zip missing — run `make dist`"
    tree = _tree_files()
    with zipfile.ZipFile(ZIP) as zf:
        zipped = {n: zf.read(n) for n in zf.namelist() if n.endswith(".py")}
    missing = sorted(set(tree) - set(zipped))
    extra = sorted(set(zipped) - set(tree))
    assert not missing, f"files missing from dist zip (run `make dist`): {missing}"
    assert not extra, f"stale files in dist zip (run `make dist`): {extra}"
    stale = sorted(rel for rel in tree if tree[rel] != zipped[rel])
    assert not stale, f"dist zip content differs from tree (run `make dist`): {stale}"
