"""Packaging surface: pyproject metadata, console entry point, module
entry point. The reference installs as a package with a `cutadapt`
script (reference: pyproject.toml:33-35, setup.py); this package's
equivalent is the `cutadapt-tpu` script declared in pyproject.toml."""

import os
import subprocess
import sys

import cutadapt_tpu

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject() -> str:
    with open(os.path.join(REPO, "pyproject.toml")) as f:
        return f.read()


def test_pyproject_declares_console_script():
    text = _pyproject()
    assert "[project.scripts]" in text
    assert 'cutadapt-tpu = "cutadapt_tpu.cli:main_cli"' in text


def test_console_entry_target_exists():
    from cutadapt_tpu.cli import main_cli  # the declared entry point

    assert callable(main_cli)


def test_version_attr_is_pep440ish():
    v = cutadapt_tpu.__version__
    parts = v.split(".")
    assert len(parts) >= 2 and all(p.isdigit() for p in parts[:2])


def test_module_entry_point_version():
    r = subprocess.run(
        [sys.executable, "-m", "cutadapt_tpu", "--version"],
        capture_output=True,
        text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        timeout=120,
    )
    assert r.returncode == 0
    assert cutadapt_tpu.__version__ in r.stdout


def test_native_source_is_package_data():
    # the wheel must carry the C++ source (compiled on first import),
    # never a prebuilt host-specific .so
    text = _pyproject()
    assert 'hostops.cpp' in text
    src = os.path.join(REPO, "cutadapt_tpu", "native", "hostops.cpp")
    assert os.path.exists(src)


def test_cli_reference_doc_is_current():
    """docs/reference.md is generated from the CLI option table
    (tools/gen_cli_reference.py); regenerate it when the table
    changes."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_cli_reference.py")],
        capture_output=True,
        text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    committed = open(os.path.join(REPO, "docs", "reference.md")).read()
    assert r.stdout == committed, (
        "docs/reference.md is stale - run: "
        "python tools/gen_cli_reference.py > docs/reference.md"
    )


def test_docs_exist_and_crosslink():
    docs = os.path.join(REPO, "docs")
    for name in ("guide.md", "tpu.md", "multihost.md", "recipes.md",
                 "reference.md"):
        path = os.path.join(docs, name)
        assert os.path.exists(path), name
        assert os.path.getsize(path) > 1000, name
