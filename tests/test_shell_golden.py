"""MITC shell golden regression: exB-exE 731/741 vs <model>_correct.log.

Same comparison protocol as test_static_golden (test_FrontISTR.rb threshold
1e-4 on the 4-digit log summaries)."""

import os

import pytest

from tests.conftest import requires_reference, REFERENCE
from tests.test_static_golden import _run_model, _summaries, _compare


@requires_reference
@pytest.mark.parametrize("suite,prefix", [
    ("exB", "B"),   # shell-surface pressure P0
    ("exC", "C"),   # body force BZ
    ("exD", "D"),   # GRAV
    ("exE", "E"),   # CENT centrifugal
])
@pytest.mark.parametrize("et", ["731", "741"])
def test_shell_golden(suite, prefix, et):
    from frontistr_tpu.io.logio import parse_log_summaries
    d = os.path.join(REFERENCE, "examples", "static", suite)
    name = prefix + et
    cnt = name + ".cnt" if suite == "exB" else prefix + "700.cnt"
    gold = os.path.join(d, name + "_correct.log")
    if not os.path.exists(gold):
        pytest.skip(f"no golden for {name}")
    mesh, model, res = _run_model(os.path.join(d, name + ".msh"),
                                  os.path.join(d, cnt))
    assert res.relres < 1e-7
    golden = parse_log_summaries(gold)
    node, elem = _summaries(model, res)
    errs = _compare(node, golden["Node"])
    errs += [f"@Element {e}" for e in _compare(elem, golden["Element"])]
    assert not errs, f"{name}: " + "; ".join(errs)
