"""The checked-in --py-files deploy artifact must match the tree (ADVICE
r2): a stale zip means README's spark-submit recipe runs pre-fix code.
Regenerate with ``python tools/make_dist.py`` when this fails.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "dist", "swmaestro_crawler_spark.zip")
PKG = os.path.join(REPO, "swmaestro_crawler_spark")


def _tree_files() -> dict[str, bytes]:
    out = {}
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for name in sorted(files):
            if name.endswith(".py"):
                full = os.path.join(root, name)
                out[os.path.relpath(full, REPO)] = open(full, "rb").read()
    return out


def test_dist_zip_matches_tree():
    tree = _tree_files()
    with zipfile.ZipFile(ZIP) as z:
        zipped = {n: z.read(n) for n in z.namelist() if not n.endswith("/")}
    missing = sorted(set(tree) - set(zipped))
    extra = sorted(set(zipped) - set(tree))
    stale = sorted(n for n in set(tree) & set(zipped) if tree[n] != zipped[n])
    assert not missing and not extra and not stale, (
        f"dist zip out of date — run tools/make_dist.py "
        f"(missing={missing} extra={extra} stale={stale})"
    )
