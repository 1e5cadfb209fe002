"""Packaging: installable-artifact parity with the reference.

The reference publishes a fat jar (sbt-assembly, /root/reference/
build.sbt:1-9; CI upload .github/workflows/main.yml:12-29).  Ours is a
PEP 621 wheel built by the in-tree backend (_build_backend.py), which
must work even where the `wheel` package is absent — the sandbox is
exactly such a host, so these tests exercise the fallback for real.
"""

import os
import sys
import tomllib
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import _build_backend as bb  # noqa: E402


def test_pyproject_metadata_is_complete():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        doc = tomllib.load(f)
    proj = doc["project"]
    assert proj["name"] == "location-summary-etl-spark"
    import location_summary_etl_spark as pkg

    assert proj["version"] == pkg.__version__
    deps = " ".join(proj["dependencies"])
    for need in ("pyspark", "pyarrow", "pandas", "numpy"):
        assert need in deps
    extras = " ".join(proj["optional-dependencies"]["test"])
    for need in ("pytest", "duckdb", "hypothesis"):
        assert need in extras
    assert (
        proj["scripts"]["location-summary-etl-spark"]
        == "location_summary_etl_spark.__main__:main"
    )
    assert doc["build-system"]["build-backend"] == "_build_backend"


def test_console_entry_point_resolves_and_prints_queries(capsys):
    """The console-script target must be importable and runnable."""
    from location_summary_etl_spark.__main__ import main

    rc = main(["list"])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert len(out) >= 160  # full corpus listed
    assert "flagship_nation_summary" in out


def test_fallback_wheel_is_spec_conformant(tmp_path):
    name = bb.build_wheel(str(tmp_path))
    assert name.endswith("py3-none-any.whl")
    zf = zipfile.ZipFile(tmp_path / name)
    names = zf.namelist()
    assert "location_summary_etl_spark/__main__.py" in names
    di = [n for n in names if ".dist-info/" in n]
    base = di[0].split("/")[0]
    for member in ("METADATA", "WHEEL", "RECORD", "entry_points.txt"):
        assert f"{base}/{member}" in names
    meta = zf.read(f"{base}/METADATA").decode()
    assert "Name: location-summary-etl-spark" in meta
    assert "Requires-Dist: pyspark" in meta
    assert 'Requires-Dist: duckdb>=0.9 ; extra == "test"' in meta
    # RECORD rows: every payload file listed with a sha256 hash
    record = zf.read(f"{base}/RECORD").decode().splitlines()
    hashed = [r for r in record if "sha256=" in r]
    assert len(hashed) == len(names) - 1  # all but RECORD itself


def test_fallback_editable_wheel_points_at_repo(tmp_path):
    name = bb.build_editable(str(tmp_path))
    zf = zipfile.ZipFile(tmp_path / name)
    pth = [n for n in zf.namelist() if n.endswith(".pth")]
    assert len(pth) == 1
    assert zf.read(pth[0]).decode().strip() == REPO
    dui = [n for n in zf.namelist() if n.endswith("direct_url.json")]
    assert dui and b'"editable": true' in zf.read(dui[0])


def test_fallback_sdist_builds(tmp_path):
    name = bb.build_sdist(str(tmp_path))
    assert name.endswith(".tar.gz")
    import tarfile

    with tarfile.open(tmp_path / name) as tf:
        members = tf.getnames()
    assert any(m.endswith("pyproject.toml") for m in members)
    assert any(m.endswith("_build_backend.py") for m in members)
    assert any(
        m.endswith("location_summary_etl_spark/session.py") for m in members
    )
    # sdist-spec completeness (r10 ADVICE): PKG-INFO at the sdist root
    # (twine/PyPI reject tarballs without it), LICENSE, and tests/.
    base = name[: -len(".tar.gz")]
    assert f"{base}/PKG-INFO" in members
    assert f"{base}/LICENSE" in members
    assert f"{base}/tests/conftest.py" in members
    with tarfile.open(tmp_path / name) as tf:
        pkg_info = tf.extractfile(f"{base}/PKG-INFO").read().decode()
    assert pkg_info.startswith("Metadata-Version:")
    assert "Name: location-summary-etl-spark" in pkg_info


@pytest.mark.skipif(
    os.system("command -v location-summary-etl-spark >/dev/null 2>&1") != 0,
    reason="console script not installed (pip install -e . not run)",
)
def test_installed_console_script_runs_from_any_cwd(tmp_path):
    import subprocess

    out = subprocess.run(
        ["location-summary-etl-spark", "list"],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0
    assert "flagship_nation_summary" in out.stdout


def test_built_wheel_installs_into_clean_venv(tmp_path):
    """The install-the-artifact gate (r10 VERDICT #2): build the wheel
    through the in-tree backend, install THAT FILE (not an editable
    link) into a fresh venv, and run the console script from a
    foreign cwd -- `list` (metadata + registry import, no JVM) and the
    flagship smoke (full engine through the installed package).  The
    venv uses --system-site-packages so pyspark/pandas resolve without
    network; our own wheel installs with --no-deps so nothing is
    fetched.  This is exactly what CI's install-wheel leg does on a
    hosted runner (minus the flagship smoke, which needs the local
    testdata)."""
    import subprocess

    wheel = bb.build_wheel(str(tmp_path))
    venv = tmp_path / "venv"
    subprocess.run(
        [sys.executable, "-m", "venv", "--system-site-packages",
         str(venv)], check=True, timeout=120)
    pip = [str(venv / "bin" / "python"), "-m", "pip"]
    subprocess.run(
        [*pip, "install", "--no-deps", "--no-build-isolation",
         str(tmp_path / wheel)],
        check=True, capture_output=True, timeout=300)
    script = venv / "bin" / "location-summary-etl-spark"
    assert script.exists(), "console script not materialized by the wheel"
    foreign = tmp_path / "elsewhere"
    foreign.mkdir()
    out = subprocess.run(
        [str(script), "list"], cwd=str(foreign),
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "flagship_nation_summary" in out.stdout
    smoke = subprocess.run(
        [str(script), "flagship", "--sf-dir", "/root/testdata/sf0.001",
         "--out", str(tmp_path / "smoke_out")],
        cwd=str(foreign), capture_output=True, text=True, timeout=600)
    assert smoke.returncode == 0, smoke.stderr[-2000:]
    assert (tmp_path / "smoke_out").is_dir()
