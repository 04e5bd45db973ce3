"""bench.contended_verdict pinned on synthetic sample sets (VERDICT r10,
Next #2): the flag has adjudicated whether a round's headline numbers are
comparable for three rounds running, so its logic is part of the measured
surface. Each case is a shape the build has actually seen."""

import bench


def _verdict(cal=bench.CAL_JVM_SOLO_REF, cal_py=bench.CAL_PY_SOLO_REF,
             pre=None, post=None):
    return bench.contended_verdict(
        cal, cal_py,
        pre or [20000.0, 21000.0, 20500.0],
        post or [19500.0, 20800.0, 20200.0],
    )


def test_clean_flat_run_is_not_contended():
    contended, reasons, spread, drop = _verdict()
    assert not contended and reasons == []
    assert spread < 2.0 and drop < 2.0


def test_pre_sweep_spread_flags_the_r6_shape():
    """Genuine within-pre instability (4.9k-19.3k inside one artifact in
    r6) — after the full-size warm-up this shape can only mean a
    co-tenant box, and it must flag."""
    contended, reasons, spread, _ = _verdict(pre=[4874.0, 9100.0, 19335.0])
    assert contended and spread > 2.0
    assert any("spread" in r for r in reasons)


def test_post_sweep_steady_drop_flags_the_r4_collapse():
    """Best-pre vs best-post >2x: the session degraded for good
    mid-bench."""
    contended, reasons, _, drop = _verdict(
        pre=[16400.0, 16000.0, 16200.0], post=[5800.0, 5500.0, 6000.0])
    assert contended and drop > 2.0
    assert any("post-sweep" in r for r in reasons)


def test_lone_slow_post_pass_does_not_flag():
    """One post pass paying the sweep's GC debt leaves the post MAX
    intact (measured solo, both calibrations clean: post 4.7/13.1/13.8k
    on an idle box) — must NOT flag."""
    contended, reasons, _, drop = _verdict(
        pre=[15400.0, 16000.0, 20300.0], post=[4700.0, 13100.0, 13800.0])
    assert not contended, reasons
    assert drop < 2.0


def test_calibration_overage_flags_each_probe_independently():
    c1, r1, _, _ = _verdict(cal=1.5 * bench.CAL_JVM_SOLO_REF)
    assert c1 and any("jvm_calibration" in r for r in r1)
    c2, r2, _, _ = _verdict(cal_py=1.5 * bench.CAL_PY_SOLO_REF)
    assert c2 and any("py_calibration" in r for r in r2)
    # at exactly the solo reference neither probe trips
    c3, r3, _, _ = _verdict()
    assert not c3, r3
