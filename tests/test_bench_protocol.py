"""The bench's plateau detector is itself load-bearing: round 2's number
of record was 2.5x wrong because a fixed warmup+median protocol measured a
post-compile ramp. These tests pin the detector's contract on synthetic
window sequences (pure function, no TPU)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from bench import (  # noqa: E402
    PLATEAU_CLUSTER,
    PLATEAU_MAX_WINDOWS,
    _attempt_clean,
    _confirmed_record,
    _fallback_record,
    measure_plateau,
)


def run_sequence(seq):
    it = iter(seq)
    return measure_plateau(lambda: next(it), label="test")


class TestPlateauProtocol:
    def test_stable_sequence_plateaus_fast(self):
        rate, ws, ok = run_sequence([250, 255, 252, 249, 254] + [250] * 30)
        assert ok
        assert len(ws) <= PLATEAU_CLUSTER + 1
        assert 245 <= rate <= 256

    def test_monotone_ramp_never_measured_early(self):
        # round-2 failure mode: 39 -> 109 climbing windows; the old bench
        # published the median of the ramp
        ramp = list(np.linspace(40, 110, PLATEAU_MAX_WINDOWS)) + [110] * 10
        rate, ws, ok = run_sequence(ramp)
        # spread across 4 consecutive early windows exceeds 10% of their
        # median, so the detector must ride out most of the ramp (the
        # cluster first qualifies when its median reaches ~spread/0.1)
        assert rate > 90, (rate, ws)

    def test_throttled_stable_period_is_not_a_plateau(self):
        # the tunnel throttles to a STABLE ~55 after a healthy ~270 period;
        # a stable-bad cluster must not pass once a good window was seen
        seq = [270, 268, 55, 54, 56, 55, 55, 54] + [265, 268, 262, 266] + [260] * 20
        rate, ws, ok = run_sequence(seq)
        assert ok
        assert rate > 200, (rate, ws)

    def test_no_plateau_reports_best_cluster(self):
        # pure noise: never plateaus; report the best cluster median, flagged
        rng = np.random.default_rng(3)
        seq = list(rng.uniform(50, 400, PLATEAU_MAX_WINDOWS))
        rate, ws, ok = run_sequence(seq)
        assert not ok
        meds = [
            float(np.median(seq[i : i + PLATEAU_CLUSTER]))
            for i in range(len(seq) - PLATEAU_CLUSTER + 1)
        ]
        assert rate == pytest.approx(max(meds))
        assert len(ws) == PLATEAU_MAX_WINDOWS


def _rec(value, **flags):
    base = dict(
        value=value,
        plateaued=True,
        decode_plateaued=True,
        weather_limited=False,
        decode_weather_limited=False,
    )
    base.update(flags)
    return base


class TestSupervisorAgreement:
    """Round-3 lesson: the delivered headline swung 206->355 Mpixel/s
    run-to-run with `plateaued: true` on both. The supervisor now requires
    the last two CLEAN attempts to agree within 15% (retried attempts are
    discarded as measurements, not allowed to reset the pair), and retries
    weather-limited or non-plateaued attempts like failures."""

    def test_clean_requires_both_plateaus_and_fair_weather(self):
        assert _attempt_clean(_rec(300))
        assert not _attempt_clean(_rec(300, plateaued=False))
        assert not _attempt_clean(_rec(300, decode_plateaued=False))
        assert not _attempt_clean(_rec(300, weather_limited=True))
        assert not _attempt_clean(_rec(300, decode_weather_limited=True))

    def test_decode_wire_utilization_substitutes_for_plateau(self):
        # decode windows are ~1 s; tunnel jitter defeats the 10% cluster
        # even at 80-98% of the tunnel's own probed ceiling. Achieved-H2D
        # >= 75% of probe proves there was no ramp/throttle to hide.
        near_ceiling = _rec(
            300,
            decode_plateaued=False,
            decode_achieved_h2d_mb_s=32.6,
            tunnel_h2d_probe_mb_s=40.7,
        )
        assert _attempt_clean(near_ceiling)
        throttled = _rec(
            300,
            decode_plateaued=False,
            decode_achieved_h2d_mb_s=20.0,
            tunnel_h2d_probe_mb_s=40.7,
        )
        assert not _attempt_clean(throttled)

    def test_agreeing_clean_pair_confirms_better_value(self):
        out = _confirmed_record([_rec(330), _rec(350)])
        assert out is not None and out["confirmed"]
        assert out["value"] == 350
        assert out["attempts"] == [330, 350]

    def test_disagreeing_pair_does_not_confirm(self):
        # 206 vs 355: the round-3 swing must NOT self-certify
        assert _confirmed_record([_rec(206), _rec(355)]) is None

    def test_weather_limited_attempt_blocks_confirmation(self):
        assert (
            _confirmed_record([_rec(330, weather_limited=True), _rec(340)])
            is None
        )

    def test_only_last_two_attempts_must_agree(self):
        # a bad first attempt followed by an agreeing clean pair confirms
        out = _confirmed_record([_rec(206), _rec(340), _rec(350)])
        assert out is not None and out["confirmed"]
        assert out["attempts"] == [206, 340, 350]

    def test_fallback_prefers_clean_attempts(self):
        out = _fallback_record(
            [_rec(400, weather_limited=True), _rec(300), _rec(250)]
        )
        assert not out["confirmed"]
        # the weather-limited 400 loses to the best clean attempt
        assert out["value"] == 300
        assert out["attempts"] == [400, 300, 250]

    def test_fallback_with_no_clean_attempt_takes_best(self):
        out = _fallback_record(
            [_rec(220, plateaued=False), _rec(260, decode_plateaued=False)]
        )
        assert not out["confirmed"] and out["value"] == 260

    def test_retried_attempts_do_not_reset_the_clean_pair(self):
        # 400.2 / weather-flagged / no-plateau / 400.9: the two clean
        # attempts agree within 0.2% — retried attempts are discarded as
        # measurements, not allowed to break the pair.
        out = _confirmed_record(
            [
                _rec(400.2),
                _rec(318.3, weather_limited=True),
                _rec(339.4, plateaued=False),
                _rec(400.9),
            ]
        )
        assert out is not None and out["confirmed"]
        assert out["value"] == 400.9
        assert out["attempts"] == [400.2, 318.3, 339.4, 400.9]

    def test_no_confirmation_when_last_attempt_is_dirty(self):
        # the pair must END on a clean attempt: a trailing dirty attempt
        # means current conditions are unverified
        assert (
            _confirmed_record([_rec(400), _rec(401), _rec(200, plateaued=False)])
            is None
        )

    def test_collapsed_probe_cannot_self_certify(self):
        # run-F loophole: when the tunnel probe ITSELF collapses, the
        # relative achieved/probe guard reads healthy while the delivered
        # number is 2x low — the high-water anchor flags the run and two
        # collapse-period attempts must not confirm each other
        a = _rec(179.1, tunnel_degraded=True)
        b = _rec(180.5, tunnel_degraded=True)
        assert not _attempt_clean(a)
        assert _confirmed_record([a, b]) is None

    def test_probe_high_water_flags_and_persists(self, tmp_path, monkeypatch):
        import bench

        monkeypatch.setattr(
            bench, "_PROBE_HWM_PATH", str(tmp_path / "hwm.json")
        )
        # first-ever run: never flagged, sets the mark
        hwm, _, degraded = bench.probe_high_water(20.0, 40.0)
        assert hwm == 20.0 and not degraded
        # healthy run raises the mark
        hwm, _, degraded = bench.probe_high_water(30.0, 44.0)
        assert hwm == 30.0 and not degraded
        # collapsed probe (< half the mark) flags; the mark survives
        hwm, _, degraded = bench.probe_high_water(8.4, 14.0)
        assert degraded and hwm == 30.0
        # borderline (>= half) does not flag
        _, _, degraded = bench.probe_high_water(15.1, 20.0)
        assert not degraded
