"""Shared fixtures.  Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_SAMPLE = "/root/reference/tests/data/sample.log"
REFERENCE_SAMPLE_CRLF = "/root/reference/tests/data/sample_crlf.log"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


def _read_lines(path: str) -> list[str]:
    raw = open(path, "rb").read().decode()
    lines = raw.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    return [l[:-1] if l.endswith("\r") else l for l in lines]


@pytest.fixture(scope="session")
def golden_lines() -> list[str]:
    """The reference's own 62-line test corpus, read from the read-only
    reference checkout (kept as external test data, not copied into the
    repo)."""
    if not os.path.exists(REFERENCE_SAMPLE):
        pytest.skip("reference corpus not available")
    return _read_lines(REFERENCE_SAMPLE)


@pytest.fixture(scope="session")
def golden_lines_crlf() -> list[str]:
    if not os.path.exists(REFERENCE_SAMPLE_CRLF):
        pytest.skip("reference corpus not available")
    return _read_lines(REFERENCE_SAMPLE_CRLF)


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} not available")
    return SF_DIR
