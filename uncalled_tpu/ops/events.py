"""Streaming event detection (t-test segmentation of raw nanopore current).

Algorithm (behavioral spec extracted from the reference's scrappie-derived
detector, src/event_detector.cpp):

* maintain prefix sums S / SQ of the signal;
* at sample i (0-based), evaluate boundary position m = i - 5: two Welch-style
  t-statistics over [m-w, m) vs [m, m+w) for w in {3 (short), 6 (long)}
  (event_detector.cpp:174-219);
* feed each t-stat stream into a peak detector (state machine with a
  peak-height hysteresis of 0.2 and thresholds 1.4 / 9.0); a firing short
  detector masks the long detector (event_detector.cpp:221-279);
* a detected peak closes an event at boundary m - 2 whose mean/stdv come from
  the prefix sums (event_detector.cpp:296-319).

Quirks preserved for parity:

* for boundary m < 3 the short detector's "left window" wraps the ring buffer
  and actually reads S[m+6], i.e. sum1 = S[m] - S[m+6] (negative);
* `buf_mid` is u32 in the reference, so for samples i < 5 the boundary wraps
  to a huge value and the detectors *run* on the zero-valued early t-stats,
  which pulls their initial `peak_value` from FLT_MAX down to 0 before real
  t-stats arrive. We reproduce this (it changes where the first event lands).

Two implementations:

* ``detect_events_np`` -- float64 numpy + python peak scan; the test oracle,
  numerically matched to the reference (double prefix sums, float32 rounding
  at the same places).
* ``detect_block`` -- batched JAX version: vectorized t-stats + a
  ``lax.scan`` over samples carrying peak-detector states and open-event
  accumulators. Fixed shapes; chunk-streaming friendly (state in / state out).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

W1 = 3
W2 = 6
THRESH1 = 1.4
THRESH2 = 9.0
PEAK_HEIGHT = 0.2
# defaults.toml [event_detector] values (the CLI-effective ones)
MIN_MEAN = 0.0
MAX_MEAN = 40000.0

TAIL = 2 * W2  # raw-sample carry needed for cross-block t-stats
DELAY = 7  # event boundary (m-2) lags the current sample by 7

FLT_MAX = np.float32(np.finfo(np.float32).max)
FLT_MIN = np.float32(np.finfo(np.float32).tiny)
_BIG = np.int64(1) << 32


# --------------------------------------------------------------------------
# numpy oracle
# --------------------------------------------------------------------------

def _tstats_np(signal: np.ndarray):
    """t-stat streams: entry i is the value seen by the detectors at sample i
    (boundary m = i-5); 0 when the reference returns 0 (t <= 2w)."""
    xf = signal.astype(np.float32)
    x = xf.astype(np.float64)
    n = len(x)
    S = np.zeros(n + 1)
    SQ = np.zeros(n + 1)
    np.cumsum(x, out=S[1:])
    # parity: the reference squares the float32 sample before accumulating
    # into the double sumsq (event_detector.cpp:89: `sumsq[..] + s*s`)
    np.cumsum((xf * xf).astype(np.float64), out=SQ[1:])

    out = []
    for w, tmin in ((W1, 2 * W1), (W2, 2 * W2)):
        t = np.zeros(n, dtype=np.float32)
        i = np.arange(n)
        m = i - 5
        valid = (i + 2) > tmin  # reference: t <= 2w -> 0  (t == i+2)
        m_ok = np.clip(m, 0, n)
        # ring-buffer wrap quirk: left prefix index m+2w when m < w
        left = np.where(m_ok >= w, m_ok - w, m_ok + 2 * w)
        right = m_ok + w
        ok = valid & (m >= 0) & (right <= n)
        li, mi, ri = left[ok], m_ok[ok], right[ok]
        # type choreography mirrors event_detector.cpp:201-218 exactly:
        # sum1/sumsq1 double; sum2/sumsq2 float; mean1 = (float)(double/ w);
        # mean2 = float/float; combined_var accumulated in double with f32
        # products, rounded to float; final t in double, rounded to float.
        wf32 = np.float32(w)
        wf64 = np.float64(np.float32(w))
        sum1 = S[mi] - S[li]
        sumsq1 = SQ[mi] - SQ[li]
        sum2 = (S[ri] - S[mi]).astype(np.float32)
        sumsq2 = (SQ[ri] - SQ[mi]).astype(np.float32)
        mean1 = (sum1 / wf64).astype(np.float32)
        mean2 = sum2 / wf32  # f32 division
        comb = (
            sumsq1 / wf64
            - (mean1 * mean1).astype(np.float64)
            + (sumsq2 / wf32).astype(np.float64)
            - (mean2 * mean2).astype(np.float64)
        ).astype(np.float32)
        comb = np.maximum(comb, FLT_MIN)
        delta = mean2 - mean1  # f32
        inner = comb / wf32  # f32 division
        t[ok] = (
            np.abs(delta.astype(np.float64)) / np.sqrt(inner.astype(np.float64))
        ).astype(np.float32)
        out.append(t)
    return out[0], out[1]


@dataclass
class _Det:
    threshold: float
    window_length: int
    masked_to: int = 0
    peak_pos: int = -1
    peak_value: np.float32 = FLT_MAX
    valid_peak: bool = False


def detect_events_np(
    signal: np.ndarray,
    min_mean: float = MIN_MEAN,
    max_mean: float = MAX_MEAN,
    calibration=None,
):
    """Sequential oracle. Returns dict with arrays start, length, mean, stdv
    (events passing the mean filter) plus total_events / len_sum over all
    created events (for mean_event_len parity).

    ``calibration=(offset, range, digitisation)`` applies the reference's
    mid-stream calibration hook (event_detector.cpp:155-162): every
    created event's mean AND stdv become (v + offset) * range/digitisation
    in f32 (the stdv offset included — create_event calibrates both,
    event_detector.cpp:308-309) BEFORE the min/max mean filter
    (event_detector.cpp:107-108 checks the calibrated mean).  Use when a
    data source delivers uncalibrated integer samples."""
    xf = signal.astype(np.float32)
    x = xf.astype(np.float64)
    n = len(x)
    S = np.zeros(n + 1)
    SQ = np.zeros(n + 1)
    np.cumsum(x, out=S[1:])
    # parity: the reference squares the float32 sample before accumulating
    # into the double sumsq (event_detector.cpp:89: `sumsq[..] + s*s`)
    np.cumsum((xf * xf).astype(np.float64), out=SQ[1:])
    t1, t2 = _tstats_np(signal)

    short = _Det(np.float32(THRESH1), W1)
    longd = _Det(np.float32(THRESH2), W2)

    def peak_detect(cur: np.float32, det: _Det, m_cmp: int, m: int) -> bool:
        if det.masked_to >= m_cmp:
            return False
        if det.peak_pos == -1:
            if cur < det.peak_value:
                det.peak_value = cur
            elif cur - det.peak_value > PEAK_HEIGHT:
                det.peak_value = cur
                det.peak_pos = m
        else:
            if cur > det.peak_value:
                det.peak_value = cur
                det.peak_pos = m
            if det.window_length == W1 and det.peak_value > det.threshold:
                longd.masked_to = det.peak_pos + det.window_length
                longd.peak_pos = -1
                longd.peak_value = FLT_MAX
                longd.valid_peak = False
            if det.peak_value - cur > PEAK_HEIGHT and det.peak_value > det.threshold:
                det.valid_peak = True
            if det.valid_peak and (m - det.peak_pos) > det.window_length // 2:
                det.peak_pos = -1
                det.peak_value = cur
                det.valid_peak = False
                return True
        return False

    if calibration is not None:
        cal_off = np.float32(calibration[0])
        cal_coef = np.float32(calibration[1]) / np.float32(calibration[2])
    starts, lengths, means, stdvs = [], [], [], []
    evt_st = 0
    total_events = 0
    len_sum = 0.0
    for i in range(n):
        m = i - 5
        m_cmp = m if m >= 0 else m + _BIG  # u32 wrap of buf_mid
        p1 = peak_detect(t1[i], short, m_cmp, m)
        p2 = peak_detect(t2[i], longd, m_cmp, m)
        if p1 or p2:
            evt_en = m - W1 + 1
            length = np.float32(evt_en - evt_st)
            mean = np.float32((S[evt_en] - S[evt_st]) / length)
            deltasqr = np.float32(SQ[evt_en] - SQ[evt_st])
            var = np.float32(deltasqr / length - mean * mean)
            stdv = np.float32(np.sqrt(max(var, np.float32(0.0))))
            if calibration is not None:
                mean = np.float32((mean + cal_off) * cal_coef)
                stdv = np.float32((stdv + cal_off) * cal_coef)
            total_events += 1
            len_sum += float(length)
            if min_mean <= mean <= max_mean:
                starts.append(evt_st)
                lengths.append(float(length))
                means.append(float(mean))
                stdvs.append(float(stdv))
            evt_st = evt_en
    return {
        "start": np.array(starts, dtype=np.int64),
        "length": np.array(lengths, dtype=np.float32),
        "mean": np.array(means, dtype=np.float32),
        "stdv": np.array(stdvs, dtype=np.float32),
        "total_events": total_events,
        "len_sum": np.float32(len_sum),
    }


# --------------------------------------------------------------------------
# JAX batched / streaming implementation
# --------------------------------------------------------------------------

def make_detector_state(B: int):
    """Initial streaming detector state for a batch of B read slots."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    f32, f64, i32 = jnp.float32, jnp.float64, jnp.int32
    return {
        # per-detector state, stacked [2, B]: 0 = short, 1 = long
        "masked_to": jnp.zeros((2, B), i32),
        "peak_pos": jnp.full((2, B), -1, i32),
        "peak_value": jnp.full((2, B), FLT_MAX, f32),
        "valid_peak": jnp.zeros((2, B), bool),
        # open event: start boundary (global prefix idx) + the global f64
        # prefix sums at that boundary (reference keeps double prefix rings,
        # event_detector.cpp:83-95; we carry their values instead)
        "evt_st": jnp.zeros((B,), i32),
        "S_st": jnp.zeros((B,), f64),
        "SQ_st": jnp.zeros((B,), f64),
        # index of the next sample to consume (global within read)
        "t": jnp.zeros((B,), i32),
        # totals over all created events (for mean_event_len)
        "total_events": jnp.zeros((B,), i32),
        "len_sum": jnp.zeros((B,), f32),
        # last TAIL raw samples (for cross-block t-stats)
        "tail": jnp.zeros((B, TAIL), f32),
        # global prefix sums at position (t - TAIL): seeds the block prefixes
        "S0": jnp.zeros((B,), f64),
        "SQ0": jnp.zeros((B,), f64),
    }


def reset_detector_rows(state, mask):
    """Reset the detector state of read slots where mask[B] is True."""
    import jax.numpy as jnp

    fresh = make_detector_state(mask.shape[0])
    out = {}
    for k, v in state.items():
        m = mask
        if v.ndim == 2 and v.shape[0] == 2:  # [2, B] detector fields
            m = mask[None, :]
        while m.ndim < v.ndim:
            m = m[..., None]
        out[k] = jnp.where(m, fresh[k], v)
    return out


def _tstats_block(sig, tail, S0, SQ0, t_start):
    """Vectorized t-stats for a [B, S] block given the carry.

    tail[B, TAIL]: last TAIL raw samples before this block; S0/SQ0[B]: global
    f64 prefix sums at the tail start; t_start[B]: global index of the first
    sample in this block (0 = start of read, activating the wrap quirks).

    Returns (t1, t2, S1, SQ1): per-sample t-stats [B, S] (f32) and the padded
    global f64 prefix arrays [B, TAIL+S+1]. The arithmetic replicates the
    reference type choreography (event_detector.cpp:201-218) with global
    double prefix sums, so results match the sequential oracle to within the
    rounding of a parallel f64 cumsum (~1 ulp of f64; never observable after
    the f32 round of the t-stat in practice).
    """
    import jax.numpy as jnp

    B, S = sig.shape
    f32, f64 = jnp.float32, jnp.float64
    xs32 = jnp.concatenate([tail, sig.astype(f32)], axis=1)
    zero = jnp.zeros((B, 1), f64)
    S1 = jnp.concatenate(
        [zero, jnp.cumsum(xs32.astype(f64), axis=1)], axis=1
    ) + S0[:, None]
    # parity: square in f32, accumulate in f64 (event_detector.cpp:89)
    SQ1 = jnp.concatenate(
        [zero, jnp.cumsum((xs32 * xs32).astype(f64), axis=1)], axis=1
    ) + SQ0[:, None]

    idx = jnp.arange(S)
    tg = t_start[:, None] + idx[None, :]  # global sample index per slot
    res = []
    for w, tmin in ((W1, 2 * W1), (W2, 2 * W2)):
        m = idx + TAIL - 5  # prefix index within padded block
        g = lambda P, j: jnp.take(P, j, axis=1)
        # start-of-read wrap quirk (0 <= m_global < w): left reads m+2w
        mg = tg - 5
        wrap = (mg >= 0) & (mg < w)
        left = jnp.where(wrap, (m + 2 * w)[None, :], (m - w)[None, :])
        pm = g(S1, m)
        pqm = g(SQ1, m)
        sum1 = pm - jnp.take_along_axis(S1, left, axis=1)  # f64
        sumsq1 = pqm - jnp.take_along_axis(SQ1, left, axis=1)  # f64
        sum2 = (g(S1, m + w) - pm).astype(f32)
        sumsq2 = (g(SQ1, m + w) - pqm).astype(f32)
        wf32 = f32(w)
        wf64 = f64(w)
        mean1 = (sum1 / wf64).astype(f32)
        mean2 = sum2 / wf32
        comb = (
            sumsq1 / wf64
            - (mean1 * mean1).astype(f64)
            + (sumsq2 / wf32).astype(f64)
            - (mean2 * mean2).astype(f64)
        ).astype(f32)
        comb = jnp.maximum(comb, FLT_MIN)
        delta = mean2 - mean1  # f32
        inner = comb / wf32  # f32
        t = (jnp.abs(delta.astype(f64)) / jnp.sqrt(inner.astype(f64))).astype(f32)
        # zero when t_global <= 2w (reference: t <= 2w -> 0)
        res.append(jnp.where((tg + 2) <= tmin, f32(0.0), t))
    return res[0], res[1], S1, SQ1


def detect_block(state, sig):
    """Advance detection over one [B, S] signal block.

    Returns (state', out) with out per-sample arrays (all [B, S]):
      fired  bool -- an event was emitted at this sample
      mean / stdv / start / length -- event stats (valid where fired; the
      mean filter min_mean<=mean<=max_mean is applied to `fired`)
    """
    import jax
    import jax.numpy as jnp

    B, S = sig.shape
    assert S >= 2 * TAIL, "block too small for the t-stat window carry"
    t1, t2, S1, SQ1 = _tstats_block(
        sig, state["tail"], state["S0"], state["SQ0"], state["t"]
    )
    # global f64 prefix values at the event boundary en = i - 7 per sample
    en_idx = jnp.arange(S) + TAIL - 7
    S_en = jnp.take(S1, en_idx, axis=1)
    SQ_en = jnp.take(SQ1, en_idx, axis=1)

    def step(carry, inp):
        (mask_to, peak_pos, peak_val, valid, evt_st, s_st, sq_st,
         t, total_events, len_sum) = carry
        t1i, t2i, s_en, sq_en = inp

        m = t - 5  # boundary evaluated at this sample (int32, can be < 0)
        # u32-wrap compare: m<0 behaves as huge -> detector active
        def active(mt):
            return jnp.where(m >= 0, mt < m, True)

        def one_det(k, thresh, whalf, cur, mask_to, peak_pos, peak_val, valid):
            act = active(mask_to[k])
            no_peak = peak_pos[k] == -1
            # CASE 1: no recorded maximum yet
            lower = cur < peak_val[k]
            rise = (cur - peak_val[k]) > PEAK_HEIGHT
            pv1 = jnp.where(lower | rise, cur, peak_val[k])
            pp1 = jnp.where(rise, m, peak_pos[k])
            # CASE 2: tracking a peak
            higher = cur > peak_val[k]
            pv2 = jnp.where(higher, cur, peak_val[k])
            pp2 = jnp.where(higher, m, peak_pos[k])
            vd2 = valid[k] | ((pv2 - cur > PEAK_HEIGHT) & (pv2 > thresh))
            fire = vd2 & ((m - pp2) > whalf)
            pv2f = jnp.where(fire, cur, pv2)
            pp2f = jnp.where(fire, -1, pp2)
            vd2f = jnp.where(fire, False, vd2)

            pv = jnp.where(no_peak, pv1, pv2f)
            pp = jnp.where(no_peak, pp1, pp2f)
            vd = jnp.where(no_peak, valid[k], vd2f)
            fired = (~no_peak) & fire & act
            pv = jnp.where(act, pv, peak_val[k])
            pp = jnp.where(act, pp, peak_pos[k])
            vd = jnp.where(act, vd, valid[k])
            return pv, pp, vd, fired, pv2, pp2, no_peak, act

        s_pv, s_pp, s_vd, p1, s_pv2, s_pp2, s_nopk, s_act = one_det(
            0, THRESH1, W1 // 2, t1i, mask_to, peak_pos, peak_val, valid
        )
        # short-dominates-long (uses short's updated case-2 peak)
        dom = s_act & (~s_nopk) & (s_pv2 > THRESH1)
        mask_to = mask_to.at[1].set(jnp.where(dom, s_pp2 + W1, mask_to[1]))
        peak_pos = peak_pos.at[1].set(jnp.where(dom, -1, peak_pos[1]))
        peak_val = peak_val.at[1].set(jnp.where(dom, FLT_MAX, peak_val[1]))
        valid = valid.at[1].set(jnp.where(dom, False, valid[1]))

        l_pv, l_pp, l_vd, p2, *_ = one_det(
            1, THRESH2, W2 // 2, t2i, mask_to, peak_pos, peak_val, valid
        )

        mask_to = mask_to  # long's mask only changed by short above
        peak_pos = peak_pos.at[0].set(s_pp).at[1].set(l_pp)
        peak_val = peak_val.at[0].set(s_pv).at[1].set(l_pv)
        valid = valid.at[0].set(s_vd).at[1].set(l_vd)

        fired = p1 | p2

        # on fire: event covers [evt_st, en) with en = m - 2; stats from the
        # global f64 prefix sums, rounded exactly like create_event
        # (event_detector.cpp:296-319 via the oracle's type choreography)
        f32, f64 = jnp.float32, jnp.float64
        en = m - 2
        length = (en - evt_st).astype(f32)
        lsafe = jnp.maximum(length, f32(1.0))
        mean = ((s_en - s_st) / lsafe.astype(f64)).astype(f32)
        deltasqr = (sq_en - sq_st).astype(f32)
        var = deltasqr / lsafe - mean * mean
        stdv = jnp.sqrt(jnp.maximum(var, f32(0.0)))

        keep = fired & (mean >= MIN_MEAN) & (mean <= MAX_MEAN)
        out = (keep, mean, stdv, evt_st, length)

        total_events = total_events + fired
        len_sum = len_sum + jnp.where(fired, length, f32(0.0))
        evt_st = jnp.where(fired, en, evt_st)
        s_st = jnp.where(fired, s_en, s_st)
        sq_st = jnp.where(fired, sq_en, sq_st)

        carry = (mask_to, peak_pos, peak_val, valid, evt_st, s_st, sq_st,
                 t + 1, total_events, len_sum)
        return carry, out

    init = (
        state["masked_to"], state["peak_pos"], state["peak_value"],
        state["valid_peak"], state["evt_st"], state["S_st"],
        state["SQ_st"], state["t"], state["total_events"], state["len_sum"],
    )
    ins = (t1.T, t2.T, S_en.T, SQ_en.T)  # [S, B] each
    carry, outs = jax.lax.scan(step, init, ins)
    (mask_to, peak_pos, peak_val, valid, evt_st, s_st, sq_st,
     t, total_events, len_sum) = carry

    xs = sig.astype(jnp.float32)
    state_out = dict(state)
    state_out.update(
        masked_to=mask_to, peak_pos=peak_pos, peak_value=peak_val,
        valid_peak=valid, evt_st=evt_st, S_st=s_st, SQ_st=sq_st,
        t=t, total_events=total_events, len_sum=len_sum,
        tail=jnp.concatenate([state["tail"], xs], axis=1)[:, -TAIL:],
        # prefix carry advances to position (t_new - TAIL) = padded index S
        S0=S1[:, S],
        SQ0=SQ1[:, S],
    )
    fired, mean, stdv, start, length = outs
    out = {
        "fired": fired.T,
        "mean": mean.T,
        "stdv": stdv.T,
        "start": start.T,
        "length": length.T,
    }
    return state_out, out
