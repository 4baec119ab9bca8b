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
        assert [a["value"] for a in out["attempts"]] == [330, 350]

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
        assert [a["value"] for a in out["attempts"]] == [206, 340, 350]

    def test_fallback_prefers_clean_attempts(self):
        out = _fallback_record(
            [_rec(400, weather_limited=True), _rec(300), _rec(250)]
        )
        assert not out["confirmed"]
        # the weather-limited 400 loses to the best clean attempt
        assert out["value"] == 300
        assert [a["value"] for a in out["attempts"]] == [400, 300, 250]

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
        assert [a["value"] for a in out["attempts"]] == [400.2, 318.3, 339.4, 400.9]

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


class TestSelfExplainingRecords:
    """Round-4 verdict Missing #2: BENCH_r04.json said `confirmed: false`
    after attempts [418.4, 421.1, 274.2, 406.0] and could not explain why
    its own 0.6%-agreeing 418.4/421.1 pair failed to confirm — per-attempt
    retry flags died in stderr. The published record now carries the flag
    history per attempt."""

    ATTEMPT_KEYS = {
        "value",
        "plateaued",
        "decode_plateaued",
        "weather_limited",
        "decode_weather_limited",
        "tunnel_degraded",
        "clean",
    }

    def test_attempt_schema_pinned(self):
        out = _fallback_record([_rec(300), _rec(200, plateaued=False)])
        for a in out["attempts"]:
            assert self.ATTEMPT_KEYS.issubset(a.keys())
        assert out["attempts"][0]["clean"] is True
        assert out["attempts"][1]["clean"] is False
        assert out["attempts"][1]["plateaued"] is False

    def test_r04_driver_sequence_is_self_explaining(self):
        # the r04 driver sequence: clean, unclean-at-2, unclean, unclean
        # -> unconfirmed best; the record must name each blocking flag
        results = [
            _rec(418.4),
            _rec(421.1, tunnel_degraded=True),
            _rec(274.2, weather_limited=True),
            _rec(406.0, tunnel_degraded=True),
        ]
        assert _confirmed_record(results) is None
        out = _fallback_record(results)
        assert not out["confirmed"]
        assert out["value"] == 418.4  # best (only) clean attempt wins
        flags = out["attempts"]
        assert [a["value"] for a in flags] == [418.4, 421.1, 274.2, 406.0]
        assert flags[0]["clean"] and not flags[1]["clean"]
        assert flags[1]["tunnel_degraded"] is True
        assert flags[2]["weather_limited"] is True
        assert flags[3]["tunnel_degraded"] is True

    def test_resumed_attempts_are_marked(self):
        prior = _rec(400)
        prior["resumed"] = True
        out = _confirmed_record([prior, _rec(405)])
        assert out is not None and out["confirmed"]
        assert out["attempts"][0].get("resumed") is True
        assert "resumed" not in out["attempts"][1]
        assert "resumed" not in out  # the top-level record is not marked


class TestProbeHighWaterDecay:
    """Round-4 advisor finding: an undecaying high-water mark lets one
    anomalously high probe permanently flag all later normal runs
    tunnel_degraded. Entries now expire after HWM_TTL_S."""

    def test_outlier_probe_ages_out(self, tmp_path, monkeypatch):
        import bench

        monkeypatch.setattr(bench, "_PROBE_HWM_PATH", str(tmp_path / "hwm.json"))
        t0 = 1_000_000.0
        # anomalous 80 MB/s probe recorded at t0
        bench.probe_high_water(80.0, 90.0, now=t0)
        # an hour later, a normal 25 MB/s probe is flagged (mark is fresh)
        _, _, degraded = bench.probe_high_water(25.0, 40.0, now=t0 + 3600)
        assert degraded
        # after the TTL, the outlier has aged out: the same normal probe
        # is clean (anchor is now the hour-old 25, not the expired 80)
        _, _, degraded = bench.probe_high_water(
            25.0, 40.0, now=t0 + bench.HWM_TTL_S + 7200
        )
        assert not degraded

    def test_legacy_single_mark_format_migrates(self, tmp_path, monkeypatch):
        import json as _json

        import bench

        path = tmp_path / "hwm.json"
        monkeypatch.setattr(bench, "_PROBE_HWM_PATH", str(path))
        path.write_text(_json.dumps({"d2h": 30.0, "h2d": 44.0}))
        hwm, _, degraded = bench.probe_high_water(10.0, 20.0)
        assert degraded and hwm == 30.0


class TestAttemptResume:
    """Round-4 verdict task 1(b): a single weather window exhausted the
    driver's 4-attempt budget even though same-day runs confirmed
    repeatedly. Clean attempts now persist to a side file and a later
    run of the SAME code resumes from them."""

    def test_roundtrip_and_ttl(self, tmp_path, monkeypatch):
        import bench

        monkeypatch.setattr(
            bench, "_ATTEMPTS_PATH", str(tmp_path / "attempts.json")
        )
        t0 = 2_000_000.0
        fresh = _rec(400)
        fresh["ts"] = t0
        stale = _rec(390)
        stale["ts"] = t0 - bench.RESUME_TTL_S - 60
        bench._save_attempts("fp1", [stale, fresh])
        got = bench._load_resumable_attempts("fp1", now=t0 + 60)
        assert [r["value"] for r in got] == [400]  # stale one expired
        assert all(r["resumed"] for r in got)

    def test_fingerprint_mismatch_discards(self, tmp_path, monkeypatch):
        import bench

        monkeypatch.setattr(
            bench, "_ATTEMPTS_PATH", str(tmp_path / "attempts.json")
        )
        r = _rec(400)
        r["ts"] = 2_000_000.0
        bench._save_attempts("fp1", [r])
        assert bench._load_resumable_attempts("fp2", now=2_000_060.0) == []

    def test_resumed_clean_plus_fresh_agreeing_attempt_confirms(self):
        # the intended driver flow: my earlier session's clean attempt +
        # the driver's one fresh clean attempt -> confirmed in 1 attempt
        prior = _rec(410)
        prior["resumed"] = True
        out = _confirmed_record([prior, _rec(395)])
        assert out is not None and out["confirmed"]
        assert out["value"] == 410

    def test_fresh_dirty_attempt_still_blocks_confirmation(self):
        # resume never lets stale cleans self-confirm: the LATEST attempt
        # (this run) must be clean
        prior_a = _rec(410)
        prior_a["resumed"] = True
        prior_b = _rec(405)
        prior_b["resumed"] = True
        assert (
            _confirmed_record(
                [prior_a, prior_b, _rec(200, weather_limited=True)]
            )
            is None
        )

    def test_source_fingerprint_is_stable_and_short(self):
        import bench

        fp1 = bench._source_fingerprint()
        fp2 = bench._source_fingerprint()
        assert fp1 == fp2 and len(fp1) == 16


class TestDecodeLegSelection:
    """Review finding (round 5): the published decode headline must carry
    its OWN evidence — an unplateaued dpack rate must not be published as
    clean on the strength of the flat leg's wire utilization."""

    @staticmethod
    def _select(dec_ab, mpix, h2d_probe):
        # mirrors bench.main()'s leg-selection rule
        def _leg_evidenced(name, leg):
            if leg["plateaued"]:
                return True
            if name == "flat":
                util = leg["wire_mb"] * leg["rate"] / mpix
                return util >= 0.75 * h2d_probe
            return False

        evidenced = {k: v for k, v in dec_ab.items() if _leg_evidenced(k, v)}
        pool = (
            evidenced
            or {k: v for k, v in dec_ab.items() if k == "flat"}
            or dec_ab
        )
        return max(pool, key=lambda k: pool[k]["rate"])

    def test_unplateaued_dpack_not_picked_over_evidenced_flat(self):
        dec_ab = {
            "flat": dict(rate=600.0, plateaued=False, wire_mb=2.0),
            "dpack": dict(rate=700.0, plateaued=False, wire_mb=1.2),
        }
        # flat util = 2.0 * 600 / 25 = 48 MB/s >= 0.75 * 40 -> evidenced
        assert self._select(dec_ab, 25.0, 40.0) == "flat"

    def test_plateaued_dpack_wins(self):
        dec_ab = {
            "flat": dict(rate=600.0, plateaued=True, wire_mb=2.0),
            "dpack": dict(rate=700.0, plateaued=True, wire_mb=1.2),
        }
        assert self._select(dec_ab, 25.0, 40.0) == "dpack"

    def test_no_evidence_falls_back_to_flat(self):
        dec_ab = {
            "flat": dict(rate=300.0, plateaued=False, wire_mb=2.0),
            "dpack": dict(rate=700.0, plateaued=False, wire_mb=1.2),
        }
        # flat util = 24 MB/s < 0.75 * 40: nothing evidenced -> flat, whose
        # published flags then mark the attempt dirty
        assert self._select(dec_ab, 25.0, 40.0) == "flat"
