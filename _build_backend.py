"""In-tree PEP 517/660 build backend.

The reference ships an installable artifact via sbt-assembly
(/root/reference/build.sbt:1-9); our equivalent is a standard wheel.
On a normal host this backend delegates every hook to
``setuptools.build_meta``.  On a host where the ``wheel`` package is
missing (setuptools < 70.1 cannot build wheels without it, and an
air-gapped sandbox cannot download it), it falls back to assembling the
wheel zip directly from the PEP 621 metadata in pyproject.toml — the
wheel format is a documented spec (binary-distribution-format), so the
fallback is ~150 lines of stdlib.

Hooks implemented: build_wheel, build_editable, build_sdist, plus the
``get_requires_*`` introspection hooks (all return []).  The editable
wheel uses the simple ``.pth`` scheme: a ``__editable__.*.pth`` file
pointing at the project root, which is exactly what setuptools'
"compat" editable mode emits.
"""

from __future__ import annotations

import base64
import csv
import hashlib
import io
import os
import tarfile
import tomllib
import zipfile

_ROOT = os.path.dirname(os.path.abspath(__file__))

try:  # the normal path: a host with setuptools + wheel
    import wheel  # noqa: F401
    from setuptools import build_meta as _st

    _HAVE_WHEEL = True
except ImportError:
    _st = None
    _HAVE_WHEEL = False


# ---------------------------------------------------------------- metadata


def _project():
    with open(os.path.join(_ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)["project"]


def _dist_name(proj):
    # PEP 503/427 normalization for the dist-info directory name.
    return proj["name"].lower().replace("-", "_")


def _metadata_bytes(proj) -> bytes:
    lines = [
        "Metadata-Version: 2.1",
        f"Name: {proj['name']}",
        f"Version: {proj['version']}",
    ]
    if "description" in proj:
        lines.append(f"Summary: {proj['description']}")
    if proj.get("requires-python"):
        lines.append(f"Requires-Python: {proj['requires-python']}")
    if isinstance(proj.get("license"), dict) and proj["license"].get("text"):
        lines.append(f"License: {proj['license']['text']}")
    for dep in proj.get("dependencies", []):
        lines.append(f"Requires-Dist: {dep}")
    for extra, deps in proj.get("optional-dependencies", {}).items():
        lines.append(f"Provides-Extra: {extra}")
        for dep in deps:
            lines.append(f'Requires-Dist: {dep} ; extra == "{extra}"')
    body = ""
    readme = proj.get("readme")
    if isinstance(readme, str) and os.path.exists(os.path.join(_ROOT, readme)):
        lines.append("Description-Content-Type: text/markdown")
        with open(os.path.join(_ROOT, readme), encoding="utf-8") as f:
            body = "\n" + f.read()
    return ("\n".join(lines) + "\n" + body).encode("utf-8")


def _entry_points_bytes(proj) -> bytes:
    scripts = proj.get("scripts", {})
    if not scripts:
        return b""
    out = ["[console_scripts]"]
    out += [f"{name} = {target}" for name, target in sorted(scripts.items())]
    return ("\n".join(out) + "\n").encode("utf-8")


# ---------------------------------------------------------------- wheel zip


def _record_hash(data: bytes) -> str:
    digest = base64.urlsafe_b64encode(hashlib.sha256(data).digest())
    return "sha256=" + digest.decode("ascii").rstrip("=")


def _write_wheel(path: str, files: dict[str, bytes], dist_info: str) -> None:
    """Write a spec-conformant wheel: all payload files + RECORD."""
    record = io.StringIO()
    writer = csv.writer(record, lineterminator="\n")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in files.items():
            zf.writestr(name, data)
            writer.writerow([name, _record_hash(data), len(data)])
        writer.writerow([f"{dist_info}/RECORD", "", ""])
        zf.writestr(f"{dist_info}/RECORD", record.getvalue())


def _dist_info_files(proj, *, editable: bool) -> tuple[str, dict[str, bytes]]:
    name = _dist_name(proj)
    dist_info = f"{name}-{proj['version']}.dist-info"
    gen = "in-tree-backend (wheel-less fallback)"
    files = {
        f"{dist_info}/METADATA": _metadata_bytes(proj),
        f"{dist_info}/WHEEL": (
            "Wheel-Version: 1.0\n"
            f"Generator: {gen}\n"
            "Root-Is-Purelib: true\n"
            "Tag: py3-none-any\n"
        ).encode("utf-8"),
    }
    eps = _entry_points_bytes(proj)
    if eps:
        files[f"{dist_info}/entry_points.txt"] = eps
    if editable:
        import json
        import pathlib

        files[f"{dist_info}/direct_url.json"] = json.dumps({
            "url": pathlib.Path(_ROOT).as_uri(),
            "dir_info": {"editable": True},
        }).encode("utf-8")
    return dist_info, files


def _package_payload() -> dict[str, bytes]:
    """Every .py file under the package dir, for the non-editable wheel."""
    return _tree_payload("location_summary_etl_spark")


def _tree_payload(pkg: str) -> dict[str, bytes]:
    payload: dict[str, bytes] = {}
    for dirpath, dirnames, filenames in os.walk(os.path.join(_ROOT, pkg)):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, _ROOT).replace(os.sep, "/")
                with open(full, "rb") as f:
                    payload[arc] = f.read()
    return payload


def _wheel_name(proj) -> str:
    # editable and non-editable wheels share the spec filename; they
    # differ only in payload (.pth + direct_url.json vs package files)
    return f"{_dist_name(proj)}-{proj['version']}-py3-none-any.whl"


# ---------------------------------------------------------------- PEP hooks


def get_requires_for_build_wheel(config_settings=None):
    return []


def get_requires_for_build_editable(config_settings=None):
    return []


def get_requires_for_build_sdist(config_settings=None):
    return []


def build_wheel(wheel_directory, config_settings=None, metadata_directory=None):
    if _HAVE_WHEEL:
        return _st.build_wheel(wheel_directory, config_settings,
                               metadata_directory)
    proj = _project()
    dist_info, files = _dist_info_files(proj, editable=False)
    files = {**_package_payload(), **files}
    name = _wheel_name(proj)
    _write_wheel(os.path.join(wheel_directory, name), files, dist_info)
    return name


def build_editable(wheel_directory, config_settings=None,
                   metadata_directory=None):
    if _HAVE_WHEEL:
        return _st.build_editable(wheel_directory, config_settings,
                                  metadata_directory)
    proj = _project()
    dist_info, files = _dist_info_files(proj, editable=True)
    pth = f"__editable__.{_dist_name(proj)}.pth"
    files[pth] = (_ROOT + "\n").encode("utf-8")
    name = _wheel_name(proj)
    _write_wheel(os.path.join(wheel_directory, name), files, dist_info)
    return name


def build_sdist(sdist_directory, config_settings=None):
    proj = _project()
    base = f"{_dist_name(proj)}-{proj['version']}"
    name = base + ".tar.gz"
    if _HAVE_WHEEL:
        return _st.build_sdist(sdist_directory, config_settings)
    with tarfile.open(os.path.join(sdist_directory, name), "w:gz") as tf:
        def addbytes(arc: str, data: bytes) -> None:
            info = tarfile.TarInfo(f"{base}/{arc}")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

        # PKG-INFO at the sdist root is REQUIRED by the sdist spec
        # (twine/PyPI reject a tarball without it); same core-metadata
        # bytes as the wheel's METADATA (r10 ADVICE).
        addbytes("PKG-INFO", _metadata_bytes(proj))
        for arc in ["pyproject.toml", "setup.py", "README.md", "LICENSE",
                    "_build_backend.py"]:
            full = os.path.join(_ROOT, arc)
            if os.path.exists(full):
                tf.add(full, arcname=f"{base}/{arc}")
        for arc, data in _package_payload().items():
            addbytes(arc, data)
        # tests/ ship in the sdist (not the wheel) for source-
        # distribution completeness -- same .py-only walk as the
        # package payload.
        for arc, data in _tree_payload("tests").items():
            addbytes(arc, data)
    return name
