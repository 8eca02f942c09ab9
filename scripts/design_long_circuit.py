"""Design study for the LONG-RANGE constructed retrieval circuit.

Finds the positional-kernel amplitudes and validates the margin budget
that models/constructed.py's long-range variant hard-codes. Offline
design tool (numpy only) — run it to regenerate/verify the constants:

    python scripts/design_long_circuit.py

The circuit's previous-token heads score positions with a RoPE-phase
kernel  K(D) = sum_p a_p cos(w_p (D - offset)),  D = i - j >= 0.
Because a_p >= 0, the peak at D = offset is global; the design problem is
to pick amps a (sum 1) maximizing the WORST-CASE margin
min_{D != offset} [K(offset) - K(D)] over the whole target range — a
linear program, solved here by cutting planes. The quantity that decides
retrieval is the softmax noise mass  S = sum_D e^{-lambda * margin(D)}
(attention weight leaked off the peak), reported per offset, plus its
inflation under INT4-KV score noise (E[e^{l*d}] = e^{l^2 s^2 / 2}).

Matching heads live on the slowest `n_match_pairs` RoPE pairs; their
phase drift over the full range and the J-coupling cross-talk it induces
between orthonormal codes are reported against the BOS-sink margin.
"""

import numpy as np
from scipy.optimize import linprog

D_HEAD = 64
N_PAIRS = D_HEAD // 2  # 32


def inv_freq(theta):
    return 1.0 / theta ** (np.arange(0, D_HEAD, 2, dtype=np.float64) / D_HEAD)


def margins_for(amps, w, offset, deltas):
    """margin(D) = K(offset) - K(D) = sum_p a_p (1 - cos(w_p (D - offset)))."""
    return (amps[None, :] * (1.0 - np.cos(np.outer(deltas - offset, w)))).sum(1)


def optimize_amps(w, offset, L, n_dense=65536):
    """Max-min margin amps via cutting planes on the LP.

    Constraint set starts from a log-dense sample of D in [0, L] and grows
    with the exact argmin until the sampled and exact minima agree."""
    deltas = np.unique(np.concatenate([
        np.arange(0, 4096),
        np.geomspace(4096, L, n_dense).astype(np.int64),
    ]))
    deltas = deltas[deltas != offset].astype(np.float64)
    all_d = None  # full range, built lazily for the exact check

    P = len(w)
    active = deltas
    for _ in range(12):
        # LP: max t  s.t.  C a >= t, sum a = 1, a >= 0
        C = 1.0 - np.cos(np.outer(active - offset, w))  # [n, P]
        res = linprog(
            c=np.concatenate([np.zeros(P), [-1.0]]),
            A_ub=np.hstack([-C, np.ones((len(active), 1))]),
            b_ub=np.zeros(len(active)),
            A_eq=np.concatenate([np.ones(P), [0.0]])[None, :],
            b_eq=[1.0],
            bounds=[(0, None)] * P + [(None, None)],
            method="highs",
        )
        amps, t = res.x[:P], res.x[P]
        # exact argmin over every integer D in [0, L] (chunked)
        worst_d, worst_m = None, np.inf
        for lo in range(0, int(L) + 1, 1 << 22):
            hi = min(lo + (1 << 22), int(L) + 1)
            dd = np.arange(lo, hi, dtype=np.float64)
            dd = dd[dd != offset]
            m = margins_for(amps, w, offset, dd)
            i = int(np.argmin(m))
            if m[i] < worst_m:
                worst_m, worst_d = m[i], dd[i]
        if worst_m >= t - 1e-6:
            return amps, worst_m, worst_d
        active = np.concatenate([active, [worst_d]])
    return amps, worst_m, worst_d


def noise_mass(amps, w, offset, L, lam):
    """S = sum over integer D in [0, L] of e^{-lam * margin(D)}."""
    S = 0.0
    for lo in range(0, int(L) + 1, 1 << 22):
        hi = min(lo + (1 << 22), int(L) + 1)
        dd = np.arange(lo, hi, dtype=np.float64)
        dd = dd[dd != offset]
        S += float(np.exp(-lam * margins_for(amps, w, offset, dd)).sum())
    return S


def main():
    theta = 1e14
    L = 4_194_304  # design range: past the reference's 3.3M demo
    w = inv_freq(theta)
    print(f"theta={theta:g}  L={L}")
    print("pair frequencies:", np.array2string(w, precision=2))

    # --- positional heads: usable pairs are those that actually vary ---
    # over the range (w*L >= pi); near-DC pairs add no discrimination.
    usable = np.where(w * L >= np.pi)[0]
    print(f"positional pairs: {usable.min()}..{usable.max()} "
          f"({len(usable)} freqs)")
    wp = w[usable]
    for offset in (1, 2):
        amps, m, worst_d = optimize_amps(wp, offset, L)
        for lam in (100.0, 150.0, 200.0):
            S = noise_mass(amps, wp, offset, L, lam)
            # INT4-KV score noise sigma (kernel units) inflates the mass
            for sig in (0.0, 0.02, 0.04):
                infl = np.exp(lam ** 2 * sig ** 2 / 2)
                print(f"  offset={offset} lam={lam:.0f} sig={sig}: "
                      f"S={S * infl:.3e}")
        print(f"  offset={offset}: min margin {m:.4f} at D={worst_d:.0f}")
        print(f"  amps = {np.array2string(amps, precision=5, floatmode='fixed')}")

    # --- matching heads: slowest pairs, drift + cross-talk ---
    # 16 pairs (32-dim codes) rather than the 14 strictly-slow ones:
    # empirically the 28-dim codes carry enough extra per-dim energy to
    # lose decode margin under stacked W8A8+INT4-KV noise, while pair 16's
    # 0.42 rad worst-case drift costs little (avg retention below).
    n_match = 16
    match_pairs = np.arange(N_PAIRS - n_match, N_PAIRS)
    drift = w[match_pairs] * L
    print(f"match pairs {match_pairs.min()}..{match_pairs.max()}: "
          f"max drift {drift.max():.4f} rad; worst-case (single-pair "
          f"code) retention {np.cos(drift.max()):.3f}, avg-energy "
          f"retention {np.mean(np.cos(drift)):.4f}")
    # cross-talk: for two orthonormal 2*n_match-dim codes a,b the drifted
    # score is cos(phi) a.b + sin(phi) a.Jb; |a.Jb| <= 1, typically
    # ~1/sqrt(2 n_match). Monte-Carlo the worst pair over a 27-code basis.
    rng = np.random.default_rng(0)
    worst = 0.0
    for _ in range(200):
        q, _ = np.linalg.qr(rng.standard_normal((2 * n_match, 2 * n_match)))
        basis = q[:27]
        c, s = basis[:, :n_match], basis[:, n_match:]
        # J maps (c, s) -> (-s, c); a.Jb = sum(-a_c b_s + a_s b_c)
        J = c @ s.T - s @ c.T  # antisymmetric [27, 27]
        worst = max(worst, float(np.abs(J).max()))
    xtalk = np.sin(drift.max()) * worst
    print(f"cross-talk bound: sin(drift)*|a.Jb|_max = {xtalk:.4f} "
          f"-> {40 * xtalk:.2f} nats at lambda_match=40")

    # --- f32 RoPE phase error at L (why the precise mode exists) ---
    for pos in (131072, 524288, 1048576, 4194304):
        err = pos * w[0] * 2 ** -24 * 2  # w rounding + product rounding
        print(f"f32 phase error at pos={pos}: ~{err:.3f} rad")


if __name__ == "__main__":
    main()
