"""find_peaks device-kernel parity tests vs scipy.signal.find_peaks."""

import numpy as np
import pytest
from scipy.signal import find_peaks

from waveformanalysis_tpu.ops import peaks as P


def run_both(signal, height=30.0, distance=2, prominence=0.7, width=4,
             max_peaks=32, threshold=None):
    """Run scipy per-row and the batched kernel; return (scipy_list, dev)."""
    signal = np.asarray(signal, dtype=np.float32)
    scipy_out = []
    for row in signal:
        pos, props = find_peaks(
            row.astype(np.float64), height=height, distance=distance,
            prominence=prominence, width=width,
            threshold=(None if threshold is None
                       else (threshold if np.isscalar(threshold)
                             else list(threshold))),
        )
        scipy_out.append((pos, props))
    dev_threshold = None
    if threshold is not None:
        dev_threshold = ((float(threshold), None) if np.isscalar(threshold)
                         else tuple(None if t is None else float(t)
                                    for t in threshold))
    dev = P.find_peaks_batch(
        signal, height=float(height), prominence=float(prominence),
        width=float(width), distance=int(distance), max_peaks=max_peaks,
        threshold=dev_threshold,
    )
    dev = {k: np.asarray(v) for k, v in dev.items()}
    return scipy_out, dev


def assert_parity(scipy_out, dev, check_ips=True):
    for i, (pos, props) in enumerate(scipy_out):
        got_pos = dev["position"][i][dev["valid"][i]]
        np.testing.assert_array_equal(
            got_pos, pos, err_msg=f"row {i}: positions differ"
        )
        if check_ips and len(pos):
            np.testing.assert_allclose(
                dev["left_ips"][i][dev["valid"][i]], props["left_ips"],
                atol=2e-3, err_msg=f"row {i}: left_ips",
            )
            np.testing.assert_allclose(
                dev["right_ips"][i][dev["valid"][i]], props["right_ips"],
                atol=2e-3, err_msg=f"row {i}: right_ips",
            )
            np.testing.assert_allclose(
                dev["prominence"][i][dev["valid"][i]], props["prominences"],
                rtol=1e-4, atol=1e-3, err_msg=f"row {i}: prominences",
            )


class TestFindPeaksParity:
    def test_single_clean_pulse(self):
        L = 128
        sig = np.zeros((1, L), np.float32)
        sig[0, 50:60] = [10, 40, 80, 100, 95, 70, 45, 20, 10, 5]
        scipy_out, dev = run_both(sig, height=30, distance=2, prominence=0.7, width=2)
        assert_parity(scipy_out, dev)

    def test_noisy_batch(self, rng):
        n, L = 16, 256
        sig = rng.normal(0, 5, (n, L)).astype(np.float32)
        for i in range(n):
            for s in rng.integers(10, L - 30, 3):
                w = int(rng.integers(5, 15))
                amp = float(rng.uniform(40, 150))
                t = np.arange(w)
                sig[i, s : s + w] += amp * np.exp(-((t - w / 2) ** 2) / (w / 3) ** 2)
        scipy_out, dev = run_both(sig)
        assert_parity(scipy_out, dev)

    def test_plateau_midpoint(self):
        sig = np.zeros((1, 64), np.float32)
        sig[0, 20:25] = 100.0  # flat-top plateau
        sig[0, 18:20] = [30, 60]
        sig[0, 25:27] = [60, 30]
        scipy_out, dev = run_both(sig, height=50, distance=1, prominence=0, width=0)
        assert_parity(scipy_out, dev)
        assert scipy_out[0][0].tolist() == [22]  # scipy midpoint

    def test_distance_pruning(self, rng):
        # dense spikes forcing the greedy distance filter to act
        n, L = 8, 200
        sig = np.zeros((n, L), np.float32)
        for i in range(n):
            positions = rng.choice(np.arange(10, 190), size=20, replace=False)
            sig[i, positions] = rng.uniform(30, 200, 20)
        scipy_out, dev = run_both(sig, height=10, distance=7, prominence=0, width=0)
        assert_parity(scipy_out, dev, check_ips=False)

    def test_equal_height_tiebreak(self):
        sig = np.zeros((1, 64), np.float32)
        sig[0, 10] = 100.0
        sig[0, 14] = 100.0  # equal height within distance
        scipy_out, dev = run_both(sig, height=10, distance=6, prominence=0, width=0)
        assert_parity(scipy_out, dev, check_ips=False)

    def test_variable_length_excludes_tail(self):
        sig = np.zeros((2, 64), np.float32)
        sig[0, 30] = 100.0
        sig[1, 45] = 100.0  # beyond valid length of 40
        import jax.numpy as jnp

        dev = P.find_peaks_batch(
            sig, height=10.0, prominence=0.0, width=0.0, distance=1,
            valid_length=jnp.asarray(np.array([64, 40], np.int32)),
        )
        dev = {k: np.asarray(v) for k, v in dev.items()}
        assert dev["position"][0][dev["valid"][0]].tolist() == [30]
        assert dev["valid"][1].sum() == 0

    def test_capacity_overflow_counted(self):
        sig = np.zeros((1, 200), np.float32)
        sig[0, 2:198:4] = 100.0  # ~49 spikes > K=8
        dev = P.find_peaks_batch(
            sig, height=10.0, prominence=0.0, width=0.0, distance=1, max_peaks=8
        )
        dev = {k: np.asarray(v) for k, v in dev.items()}
        assert dev["n_candidates"][0] > 8
        assert dev["valid"][0].sum() == 8  # capped but flagged

    def test_no_peaks(self):
        sig = np.zeros((3, 64), np.float32)
        scipy_out, dev = run_both(sig)
        for i in range(3):
            assert dev["valid"][i].sum() == 0


class TestPeakHeights:
    def test_minmax_and_diff_methods(self):
        wave = np.full((1, 64), 1000.0, np.float32)
        wave[0, 30:36] = [900, 800, 750, 800, 900, 950]
        left = np.array([[29.5]], np.float32)
        right = np.array([[36.2]], np.float32)
        valid = np.array([[True]])
        h_minmax = np.asarray(P.peak_heights_batch(
            wave, left, right, valid, method="minmax", window_extension=4
        ))
        # window [round(29.5)-4, round(36.2)+4) = [26, 40): max 1000, min 750
        assert h_minmax[0, 0] == 250.0
        h_diff = np.asarray(P.peak_heights_batch(
            wave, left, right, valid, method="diff", window_extension=0
        ))
        # sum of -diff over [30, 36) telescopes to w[30] - w[36] = 900 - 1000
        assert h_diff[0, 0] == -100.0


class TestCompactHits:
    def test_flatten(self):
        results = {
            "valid": np.array([[True, False], [True, True]]),
            "position": np.array([[5, -1], [7, 9]], np.int32),
            "left_ips": np.array([[4.5, 0], [6.5, 8.5]], np.float32),
            "right_ips": np.array([[5.5, 0], [7.5, 9.5]], np.float32),
        }
        heights = np.array([[10.0, 0], [20.0, 30.0]], np.float32)
        out = P.compact_hits(
            results, heights,
            timestamps=np.array([1000, 2000], np.int64),
            boards=np.array([0, 1], np.int16),
            channels=np.array([2, 3], np.int16),
            record_ids=np.array([100, 200], np.int64),
            dt_ns=np.array([2, 2], np.int64),
        )
        np.testing.assert_array_equal(out["position"], [5, 7, 9])
        np.testing.assert_array_equal(out["record_id"], [100, 200, 200])
        # ts + pos * dt * 1000
        np.testing.assert_array_equal(out["timestamp"],
                                      [1000 + 5 * 2000, 2000 + 7 * 2000, 2000 + 9 * 2000])


class TestRandomizedScipyParity:
    """Dense-random cross-check: positions/prominences/ips vs scipy on noisy
    integer waves with injected plateaus. Rows containing an exact-height tie
    within `distance` are excluded — scipy's own tie order there comes from an
    unstable np.argsort and is implementation-defined (see ops/peaks.py)."""

    def test_dense_random_with_plateaus(self):
        from scipy.signal import find_peaks

        rng = np.random.default_rng(7)
        n, L, K, dist = 256, 128, 64, 3
        waves = rng.integers(-50, 400, (n, L)).astype(np.float64)
        for i in range(0, n, 3):
            j = rng.integers(5, L - 20)
            waves[i, j:j + rng.integers(2, 6)] = waves[i, j]

        import jax.numpy as jnp

        res = P.find_peaks_batch(
            jnp.asarray(waves, jnp.float32), 30.0, 10.0, 1.0,
            distance=dist, max_peaks=K,
        )
        assert int(np.asarray(res["n_candidates"]).max()) <= K

        checked = skipped_ties = 0
        for i in range(n):
            cand, _ = find_peaks(waves[i], height=30.0)
            h = waves[i][cand]
            tie = any(
                h[a] == h[b] and abs(cand[a] - cand[b]) < dist
                for a in range(len(cand)) for b in range(a + 1, len(cand))
            )
            if tie:
                skipped_ties += 1
                continue
            p, props = find_peaks(waves[i], height=30.0, distance=dist,
                                  prominence=10.0, width=1.0)
            valid = np.asarray(res["valid"][i])
            np.testing.assert_array_equal(
                np.asarray(res["position"][i])[valid], p, err_msg=f"row {i}"
            )
            np.testing.assert_allclose(
                np.asarray(res["prominence"][i])[valid],
                props["prominences"], atol=1e-2, err_msg=f"row {i}",
            )
            np.testing.assert_allclose(
                np.asarray(res["left_ips"][i])[valid], props["left_ips"],
                atol=5e-3, err_msg=f"row {i}",
            )
            np.testing.assert_allclose(
                np.asarray(res["right_ips"][i])[valid], props["right_ips"],
                atol=5e-3, err_msg=f"row {i}",
            )
            checked += 1
        assert checked > n // 2, (checked, skipped_ties)


def test_plateau_into_valid_length_boundary_not_a_peak():
    """A plateau running into the valid-length boundary has no real falling
    edge inside the wave — scipy (on the unpadded array) reports nothing;
    the padding sentinel must not fabricate one."""
    import jax.numpy as jnp

    sig = np.zeros((2, 32), np.float32)
    sig[0, 5:10] = np.arange(5) * 20
    sig[0, 10:20] = 100.0  # plateau up to the last valid sample (vlen=20)
    sig[1, 5] = 50.0
    r = P.find_peaks_batch(
        jnp.asarray(sig), 10.0, 0.0, 0.0, distance=1, max_peaks=8,
        valid_length=jnp.asarray(np.array([20, 32], np.int32)),
    )
    valid0 = np.asarray(r["valid"][0])
    assert not valid0.any(), np.asarray(r["position"][0])[valid0]
    pos1 = np.asarray(r["position"][1])[np.asarray(r["valid"][1])]
    np.testing.assert_array_equal(pos1, find_peaks(sig[1], height=10.0)[0])


@pytest.mark.parametrize("height,distance,prominence,width", [
    (10.0, 1, 0.5, 1.0),
    (30.0, 2, 0.7, 4.0),     # hit-plugin defaults
    (50.0, 5, 20.0, 2.0),
    (5.0, 1, 0.0, 0.0),      # permissive: many peaks per row
    (100.0, 8, 50.0, 6.0),   # strict: few survive
])
def test_config_sweep_parity(height, distance, prominence, width):
    """scipy parity across the find_peaks config space on mixed random data
    (narrow + wide pulses + plateaus + noise rows)."""
    from scipy.signal import find_peaks

    rng = np.random.default_rng(int(height * 10 + distance))
    n, L = 48, 192
    t = np.arange(L)
    sig = rng.normal(0, 3, (n, L))
    for i in range(n):
        for c in rng.integers(10, L - 10, size=rng.integers(0, 4)):
            s = rng.choice([2.0, 6.0, 15.0])
            sig[i] += rng.uniform(20, 200) * np.exp(-((t - c) ** 2) / (2 * s * s))
        if i % 5 == 0:  # plateau
            j = rng.integers(5, L - 12)
            sig[i, j:j + 4] = sig[i, j]
    sig = sig.astype(np.float32)

    dev = P.find_peaks_batch(
        sig, height=height, prominence=prominence, width=width,
        distance=distance, max_peaks=48,
    )
    dev = {k: np.asarray(v) for k, v in dev.items()}
    checked = 0
    for i in range(n):
        # skip rows with equal-height ties inside the distance window:
        # scipy's pruning order is an implementation detail there
        cand, _ = find_peaks(sig[i].astype(np.float64), height=height)
        h = sig[i][cand]
        if any(h[a] == h[b] and abs(cand[a] - cand[b]) < max(distance, 1)
               for a in range(len(cand)) for b in range(a + 1, len(cand))):
            continue
        pos, props = find_peaks(
            sig[i].astype(np.float64), height=height, distance=distance,
            prominence=prominence, width=width,
        )
        valid = dev["valid"][i]
        np.testing.assert_array_equal(dev["position"][i][valid], pos,
                                      err_msg=f"row {i}")
        if len(pos):
            np.testing.assert_allclose(dev["prominence"][i][valid],
                                       props["prominences"], atol=1e-2,
                                       err_msg=f"row {i}")
            np.testing.assert_allclose(dev["left_ips"][i][valid],
                                       props["left_ips"], atol=5e-3,
                                       err_msg=f"row {i}")
            np.testing.assert_allclose(dev["right_ips"][i][valid],
                                       props["right_ips"], atol=5e-3,
                                       err_msg=f"row {i}")
        checked += 1
    assert checked > n // 2


class TestThresholdCondition:
    """scipy neighbor-threshold parity (peaks-v2): the required vertical
    distance to BOTH direct neighbor samples, evaluated at the plateau
    midpoint exactly as scipy does (plateaus wider than 1 have a zero
    neighbor diff and die under any positive tmin)."""

    def test_sharp_peaks_tmin(self, rng):
        n, L = 12, 192
        sig = rng.normal(0, 10, (n, L)).astype(np.float32)
        scipy_out, dev = run_both(sig, height=5.0, distance=1,
                                  prominence=0.1, width=0.0, threshold=4.0,
                                  max_peaks=64)
        assert_parity(scipy_out, dev, check_ips=False)
        assert sum(len(p) for p, _ in scipy_out) > 0

    def test_tmin_tmax_band(self, rng):
        n, L = 12, 192
        sig = rng.normal(0, 10, (n, L)).astype(np.float32)
        scipy_out, dev = run_both(sig, height=2.0, distance=1,
                                  prominence=0.1, width=0.0,
                                  threshold=(2.0, 25.0), max_peaks=64)
        assert_parity(scipy_out, dev, check_ips=False)
        assert sum(len(p) for p, _ in scipy_out) > 0

    def test_tmax_only(self, rng):
        n, L = 8, 128
        sig = rng.normal(0, 10, (n, L)).astype(np.float32)
        scipy_out, dev = run_both(sig, height=2.0, distance=1,
                                  prominence=0.1, width=0.0,
                                  threshold=(None, 12.0), max_peaks=64)
        assert_parity(scipy_out, dev, check_ips=False)
        assert sum(len(p) for p, _ in scipy_out) > 0

    def test_plateaus_die_under_tmin(self):
        # width-2 and width-3 plateaus: scipy evaluates x[mid±1] INSIDE the
        # plateau (one or both neighbor diffs are 0)
        sig = np.zeros((1, 64), np.float32)
        sig[0, 10:12] = 50.0   # width-2 plateau (mid = 10)
        sig[0, 30:33] = 50.0   # width-3 plateau (mid = 31)
        sig[0, 50] = 50.0      # sharp peak
        scipy_out, dev = run_both(sig, height=5.0, distance=1,
                                  prominence=0.1, width=0.0, threshold=1.0)
        assert_parity(scipy_out, dev, check_ips=False)
        assert list(scipy_out[0][0]) == [50]

    def test_width2_plateau_left_neighbor(self):
        # width-2 plateau with tmax only: left diff = rise into the
        # plateau, right diff = 0 -> max = rise; tmax below the rise kills
        # it, tmax above keeps it
        sig = np.zeros((1, 64), np.float32)
        sig[0, 20:22] = 30.0
        for tmax in (10.0, 40.0):
            scipy_out, dev = run_both(sig, height=5.0, distance=1,
                                      prominence=0.1, width=0.0,
                                      threshold=(None, tmax))
            assert_parity(scipy_out, dev, check_ips=False)
        assert len(scipy_out[0][0]) == 1  # kept at tmax=40

    def test_combined_with_distance_and_prominence(self, rng):
        # threshold applies BEFORE distance in scipy's pipeline — a
        # threshold-killed peak must not block a nearby survivor
        n, L = 10, 160
        sig = rng.normal(0, 8, (n, L)).astype(np.float32)
        scipy_out, dev = run_both(sig, height=3.0, distance=5,
                                  prominence=1.0, width=0.0, threshold=3.0,
                                  max_peaks=64)
        assert_parity(scipy_out, dev, check_ips=False)
