"""Driver entry points: single-chip forward trace + multichip dryrun."""
import sys

import jax
import pytest

sys.path.insert(0, ".")


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_traces():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape[1] == 7


@pytest.mark.slow
def test_dryrun_multichip_cora_scale():
    """Representative-scale partitioned step on the virtual mesh — the
    VERDICT r2 #6 deliverable (compiles in seconds via the XLA conv
    path; the tiny default keeps Pallas-interpret plumbing coverage)."""
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8, scale="cora")
