"""Design the MP2 filterbank window pair embedded in
rayschema/_mp2_window.py — run `python scripts/gen_mp2_window.py` to
regenerate deterministically (no RNG anywhere in the design).

The ISO 11172-3 polyphase STRUCTURE (the spec's exact analysis/synthesis
pseudocode: X/V FIFOs, matrices M[k,i] = cos((2k+1)(i-16)pi/64) and
N[k,i] = cos((16+k)(2i+1)pi/64), the U re-indexing) is kept verbatim;
only the 512-tap window pair (C analysis, D synthesis) is free, because
ISO Table B.3's tabulated digits cannot be reproduced offline.

Design: restrict C to a 64-tap sine window (sin(pi(n+1/2)/64), the
Princen-Bradley MDCT window) on the newest FIFO block. The cascade then
collapses to a 2-granule lapped transform, and the matching synthesis
window D has an EXACT perfect-reconstruction solution (cascade SNR is
machine precision, ~283 dB; delay 481 samples) found by least squares
over a complete 32-phase impulse basis — the residual is ~1e-27, i.e.
the system is solved, not approximated. D comes out supported on the V
FIFO's lapped tail block, as the structure dictates. The pair is then
globally rescaled so the worst-case per-band analysis gain on full-scale
input stays under the 2.0 Table B.1 scale-factor ceiling (per-band scale
factors absorb the rest).

Trade-off vs ISO: a 64-tap prototype has MDCT-grade (not ISO
512-tap-grade) band selectivity, so REAL MP2 files decode with correct
framing/quantization but coarser subband filtering, while this repo's
encoder/decoder pair round-trips at quantization-limited fidelity.
"""
import base64

import numpy as np

_i = np.arange(64)[None, :]
_k = np.arange(32)[:, None]
M = np.cos((2 * _k + 1) * (_i - 16) * np.pi / 64)
_kk = np.arange(64)[:, None]
_ii = np.arange(32)[None, :]
N = np.cos((16 + _kk) * (2 * _ii + 1) * np.pi / 64)
DELAY = 481


def analysis(x, C):
    X = np.zeros(512)
    out = []
    for g in range(len(x) // 32):
        X[32:] = X[:-32]
        X[:32] = x[g * 32:(g + 1) * 32][::-1]
        Y = (X * C).reshape(8, 64).sum(axis=0)
        out.append(M @ Y)
    return np.array(out)


def synthesis(S, D):
    V = np.zeros(1024)
    out = []
    for s in S:
        V[64:] = V[:-64]
        V[:64] = N @ s
        U = np.empty(512)
        for j in range(8):
            U[64 * j:64 * j + 32] = V[128 * j:128 * j + 32]
            U[64 * j + 32:64 * j + 64] = V[128 * j + 96:128 * j + 128]
        out.append((U * D).reshape(16, 32).sum(axis=0))
    return np.concatenate(out)


def _lin_in_D(x, C):
    """Cascade output as a (T, 512) linear map of the D window."""
    S = analysis(x, C)
    V = np.zeros(1024)
    ys = []
    for s in S:
        V[64:] = V[:-64]
        V[:64] = N @ s
        U = np.empty(512)
        for j in range(8):
            U[64 * j:64 * j + 32] = V[128 * j:128 * j + 32]
            U[64 * j + 32:64 * j + 64] = V[128 * j + 96:128 * j + 128]
        Yrow = np.zeros((32, 512))
        cols = (np.arange(16)[None, :] * 32 + np.arange(32)[:, None])
        Yrow[np.arange(32)[:, None], cols] = U[cols]
        ys.append(Yrow)
    return np.concatenate(ys, axis=0)


def snr(C, D, seed=7):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(32 * 120)
    y = synthesis(analysis(x, C), D)
    a = x[200:3000]
    b = y[200 + DELAY:3000 + DELAY]
    return 10 * np.log10(np.sum(a * a) / np.sum((a - b) ** 2))


def design():
    C = np.zeros(512)
    C[:64] = np.sin(np.pi * (np.arange(64) + 0.5) / 64)
    rows, tg = [], []
    for pos in range(32):
        x = np.zeros(32 * 56)
        ip = 32 * 20 + pos
        x[ip] = 1.0
        Y = _lin_in_D(x, C)
        t = np.zeros(len(Y))
        t[ip + DELAY] = 1.0
        lo, hi = ip - 64, ip + DELAY + 1100
        rows.append(Y[lo:hi])
        tg.append(t[lo:hi])
    A = np.concatenate(rows, axis=0)
    t = np.concatenate(tg)
    D, _, _, _ = np.linalg.lstsq(A, t, rcond=None)
    # rescale: worst per-band gain under the 2.0 scale-factor ceiling
    tt = np.arange(1152 * 4)
    worst = 0.0
    for k in range(32):
        f = (2 * k + 1) / 128.0
        S = analysis(np.sin(2 * np.pi * f * tt), C)
        worst = max(worst, np.abs(S[:, k]).max())
    # square wave adds broadband worst-case headroom check
    S = analysis(np.sign(np.sin(2 * np.pi * tt / 97.0)), C)
    worst = max(worst, np.abs(S).max())
    s = 1.9 / worst
    return C * s, D / s


if __name__ == "__main__":
    C, D = design()
    print("holdout SNR:", round(snr(C, D), 2), "dB (expect ~283: exact PR)")

    def wrap(s):
        return "\n".join('    "%s"' % s[i:i + 68]
                         for i in range(0, len(s), 68))

    cb = base64.b64encode(C.astype("<f8").tobytes()).decode()
    db = base64.b64encode(D.astype("<f8").tobytes()).decode()
    with open("rayschema/_mp2_window.py", "w") as f:
        f.write('''"""Perfect-reconstruction window pair for the MP2 codec.

GENERATED DATA (deterministic, self-produced — no external source): the
512-tap analysis window C (a 64-tap Princen-Bradley sine window on the
newest FIFO block) and the exactly-solved synthesis window D for the ISO
11172-3 polyphase structure. Produced by scripts/gen_mp2_window.py —
see its docstring for the design, the exact-PR property (~283 dB cascade
SNR, delay 481) and the documented trade-off vs ISO Table B.3 (which
cannot be reproduced offline). Little-endian f64, base64.
"""
import base64

import numpy as np

_C_B64 = (
%s)

_D_B64 = (
%s)


def windows():
    c = np.frombuffer(base64.b64decode(_C_B64), "<f8")
    d = np.frombuffer(base64.b64decode(_D_B64), "<f8")
    return c.copy(), d.copy()
''' % (wrap(cb), wrap(db)))
    print("wrote rayschema/_mp2_window.py")
