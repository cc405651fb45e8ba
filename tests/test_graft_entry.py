"""The driver contract: entry() must jit-compile single-chip and
dryrun_multichip must run the full parallelism set on the virtual mesh."""
import importlib.util
import os

import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(REPO, "__graft_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.mark.slow
def test_entry_compiles():
    m = _load()
    fn, args = m.entry()
    assert jax.jit(fn).lower(*args).compile() is not None


@pytest.mark.slow
def test_dryrun_multichip_8():
    _load().dryrun_multichip(8)


@pytest.mark.slow
def test_flagship_8b_lowers_abstractly():
    """The TRUE SliME-8B config must trace + lower shape-only (VERDICT r01 #10:
    the chip-sized proxy in entry() can't catch flagship-scale config drift)."""
    assert _load().lower_flagship_abstract() is not None
