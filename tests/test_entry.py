"""Driver entry-point tests: entry() lowers, dryrun_multichip executes."""
import jax
import pytest


def test_entry_lowers():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    # lowering traces the full graph without the expensive XLA compile
    lowered = jax.jit(fn).lower(*args)
    assert "conv" in lowered.as_text().lower()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    assert len(jax.devices()) == 8
    ge.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    import __graft_entry__ as ge

    ge.dryrun_multichip(5)
