"""--py-files packaging (deploy.py + cli --package)."""

import json
import subprocess
import sys
import zipfile

from jsonschema_valid_spark.deploy import build_pyfiles_zip


def test_zip_contents_and_reproducibility(tmp_path):
    a = build_pyfiles_zip(str(tmp_path / "a.zip"))
    b = build_pyfiles_zip(str(tmp_path / "b.zip"))
    assert open(a, "rb").read() == open(b, "rb").read()  # byte-reproducible
    names = zipfile.ZipFile(a).namelist()
    assert "jsonschema_valid_spark/__init__.py" in names
    assert "jsonschema_valid_spark/engine.py" in names
    assert "jsonschema_valid_spark/operators/profile.py" in names
    assert not any("__pycache__" in n or not n.endswith(".py") for n in names)


def test_zip_is_importable(tmp_path):
    z = build_pyfiles_zip(str(tmp_path / "pkg.zip"))
    out = subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {z!r}); "
         "import jsonschema_valid_spark; "
         "from jsonschema_valid_spark.operators.anomaly import anomaly_flags; "
         "print('ok')"],
        capture_output=True, text=True, cwd=str(tmp_path))
    assert out.returncode == 0 and out.stdout.strip() == "ok", out.stderr


def test_cli_package_no_spark(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "jsonschema_valid_spark.cli",
         "--package", str(tmp_path / "cli.zip")],
        capture_output=True, text=True, timeout=60)
    assert out.returncode == 0, out.stderr
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["py_files"].endswith("cli.zip") and payload["size"] > 10000
    assert "SparkSession" not in out.stderr  # no JVM started


def test_cli_missing_args(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "jsonschema_valid_spark.cli",
         "--suite", "x.json"],
        capture_output=True, text=True, timeout=60)
    assert out.returncode == 2
    assert "--input" in out.stderr and "--output" in out.stderr
