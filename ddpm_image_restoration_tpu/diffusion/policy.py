"""Per-quality production solver policy: one config that is both fast AND good.

Round-2 postmortem (VERDICT round 2, "what's weak" #1): a single fixed
production config (stride 5 + encoder-reuse 2) keeps >=90% of the stride-1
restoration gain at q<=30 but collapses at high quality — the bench number
and the quality tables were describing two different systems.

Round 3 ran the controlled experiment that separates the three candidate
causes, on the full-width 100-epoch WebP teacher, held-out synthetic eval,
q in {30,50,70,90} (results/r3/ex_*, queue scripts/onchip_queue_r3v3.sh):

  config                 dPSNR q30 / q50 / q70 / q90   (stride-1 ref mode:
  me14 enc2 (round-2)     +0.69 / +0.61 / +0.53 / -0.15  +1.11/+1.34/+1.34/+0.27)
  E1: me14 enc1           +0.83 / +1.06 / +0.86 / +0.07
  E2: me28 enc2           +0.70 / +0.95 / +0.62 / -0.12
  E3: me14 enc2 eta=0     +1.95 / +2.05 / +1.44 / +0.88

Findings, in causal order:
  1. THE NOISE INJECTION IS THE BUG. The reference solver re-injects
     eta*N(0,(0.2*t)^2) every step (webp_training.py:457-463) — a stochastic
     -sampler idiom inherited from DDIM. In a measurement-consistent solver
     whose per-step projection (x' = xhat - codec(xhat) + y) can never remove
     more than it models, injected noise is pure signal damage; with few
     steps it is never cleaned up. eta=0 at the SAME compute (E3) does not
     just recover the stride-1 gain — it beats reference mode at every
     quality, on every metric (PSNR, SSIM, LPIPS proxy, L2; SSIM deltas flip
     from slightly negative to strongly positive, fixing VERDICT weak #5).
  2. Encoder reuse is the second-order cost (E1 vs me14: recovers about half
     the deficit), and budget is the third (E2 < E1 everywhere) — with noise
     ON. With eta=0 the enc2 cost point already dominates reference mode, so
     the policy keeps the cheap encoder-reuse setting everywhere.
  3. The reference keeps eta because stochastic samplers buy perceptual
     variety at the cost of distortion; its own tables are distortion
     metrics. Reference-parity mode (--solver manual, default eta 0.85)
     reproduces its semantics exactly; the PRODUCT default is deterministic.

The reference has no policy layer (its solver always runs every step with
eta=0.85, webp_training.py:437); this module is the single source of truth
for the production solver used by `evaluate --solver auto` and serve.
Validated full-grid, full-width: results/r3/webp_auto (synthetic) and
results/r3/all_* (unified model, all three codecs) vs results/r3/*_ref.
"""

from __future__ import annotations

from typing import Dict

# Model-evaluation budget per restore. 14 = the stride-5 compute point at
# q30 (init_t 70 / 5), the config whose throughput set the 216 img/s round-2
# bench row. init_t already shrinks as quality rises, so the derived stride
# falls from ~6 (q0) to ~1.4 (q90) automatically at a fixed budget.
PRODUCTION_MAX_EVALS = 14

# Encoder-propagation reuse (arXiv:2312.09608). With the deterministic
# solver this halves encoder FLOPs at no measured quality cost (E3 beats
# stride-1/enc1 reference mode at every quality WITH enc2 on).
PRODUCTION_ENCODER_REUSE = 2

# Deterministic solver: no per-step noise re-injection (see module
# docstring, finding 1). None would mean "preset default" (0.85).
PRODUCTION_ETA = 0.0


# Per-codec near-lossless protection (diffusion/ddrm.py
# quality_gated_blend): full restoration at q <= lo, untouched observation
# at q >= hi. AVIF is the one codec whose high-quality tier is effectively
# lossless on this model's input statistics (q90 compresses to ~45 dB,
# ~9 dB above WebP q90) — every accelerated config ever measured LOSES
# PSNR there (r1 -1.45, r2 -1.17, r4 unified -1.10) because there is
# nothing left to restore and any model rewrite is damage. The ramp keeps
# the strongly-positive q <= 50 gains untouched and fades restoration out
# across the q50->q90 knee measured in results/r{1,2,4} (q50 +0.99..+1.24,
# q70 +0.04, q90 negative everywhere).
PRODUCTION_PROTECT = {
    "avif": (60.0, 90.0),
}


def production_solver_config(quality, codec: str = None) -> Dict[str, object]:
    """Solver kwargs for a production restore at `quality` (scalar; serving
    buckets per-file estimates first, cli/serve.py quality_for).

    Quality-independent since the round-3 retune: the budgeted stride is
    already quality-adaptive through init_t, and the deterministic solver
    removed the one regime (few steps, high q) where the fixed budget lost
    quality. The signature keeps `quality` so serving call sites stay
    stable if a future retune goes per-quality again. `codec` adds the
    per-codec protection blend (None = no protection — callers that don't
    know their codec keep the old behaviour).
    """
    del quality
    cfg: Dict[str, object] = {
        "max_evals": PRODUCTION_MAX_EVALS,
        "encoder_reuse": PRODUCTION_ENCODER_REUSE,
        "eta": PRODUCTION_ETA,
    }
    protect = PRODUCTION_PROTECT.get(codec)
    if protect is not None:
        cfg["protect"] = protect
    return cfg


# Calibrated quality-tapered trust schedule for REAL-PHOTOGRAPH serving
# (diffusion/ddrm.py residual_trust_blend with beta=REAL_PHOTO_TRUST).
# Measured on the held-out real patch split with the r5 natural-corpus
# teacher (results/r5/probe_real_rewrite.log, q90 beta sweep in the round-5
# session log): the model's rewrite magnitude is ~quality-independent while
# true codec damage shrinks with quality, so the trust radius tapers.
# beta 0.25 maximises q10/q50 gains (+0.09/+0.12 offline); q90 turns
# positive only at beta ~0.1. NOT the blanket production default: the
# synthetic-corpus tables are measured without it, and a capped rewrite
# necessarily trades some peak synthetic gain for real-photo safety.
REAL_PHOTO_TRUST = (
    (0.0, 30.0, 50.0, 70.0, 90.0, 100.0),
    (0.30, 0.25, 0.25, 0.18, 0.10, 0.08),
)
