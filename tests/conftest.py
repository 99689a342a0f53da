"""Shared fixtures: one Ray session per pytest session, plus the reference module.

The reference implementation at /root/reference/app.py imports headlessly (its
Tkinter import is guarded), so conformance tests can fuzz our pure kernels
directly against the reference functions. If the reference is absent the
parity tests skip; everything else still runs.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

_REFERENCE_APP = Path("/root/reference/app.py")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def refmod():
    """The reference implementation module, imported headlessly (or skip)."""
    if not _REFERENCE_APP.exists():
        pytest.skip("reference implementation not available")
    if "refapp" in sys.modules:
        return sys.modules["refapp"]
    spec = importlib.util.spec_from_file_location("refapp", _REFERENCE_APP)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refapp"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def tiny_transcripts(tmp_path_factory):
    """Deterministic tiny transcript parquet (~200 turns / 20 convs)."""
    from pdf_ocr_batch_ndrocr_lite_ray.sources.transcripts import write_transcripts

    out = tmp_path_factory.mktemp("transcripts") / "tiny.parquet"
    write_transcripts(out, n_convs=20, seed=7)
    return out
