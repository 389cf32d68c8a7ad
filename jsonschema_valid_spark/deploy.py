"""Deployment packaging: build the ``--py-files`` archive.

The north rule deploys via ``spark-submit --py-files`` on a multi-executor
cluster; executors import the package from the shipped zip (a bare cluster
Python has no site-packages install). :func:`build_pyfiles_zip` produces
that artifact REPRODUCIBLY — fixed timestamps, sorted entries — so the
archive hash only changes when code changes (cluster-side caches and
image layers stay warm across resubmits of identical code).

    python -m jsonschema_valid_spark.cli --package /tmp/jvs.zip
    spark-submit --py-files /tmp/jvs.zip --deploy-mode cluster ...

No Spark session is needed (or started) to package.
"""

from __future__ import annotations

import os
import zipfile

_FIXED_DATE = (2020, 1, 1, 0, 0, 0)  # reproducible archive metadata


def build_pyfiles_zip(dest: str) -> str:
    """Zip every ``.py`` file of the installed package under its package
    path (``jsonschema_valid_spark/...``) so ``--py-files dest`` makes
    ``import jsonschema_valid_spark`` work on executors. Returns ``dest``."""
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_root)
    entries = []
    for base, dirs, files in os.walk(pkg_root):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(base, f)
                arc = os.path.join(pkg_name, os.path.relpath(full, pkg_root))
                entries.append((arc, full))
    entries.sort()
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, full in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=_FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return dest
