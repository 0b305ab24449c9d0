"""Per-quality production solver policy: one config that is both fast AND good.

Round-2 postmortem (VERDICT round 2, "what's weak" #1): a single fixed
production config (stride 5 + encoder-reuse 2) keeps >=90% of the stride-1
restoration gain at q<=30 but collapses at high quality — at q>=50 the
degradation is mild (init_t 50 -> only 10 coarse steps) and at q90 it turns
NEGATIVE (init_t 20 -> 4 steps, each injecting eta*0.2*t noise into an input
that is already near-lossless). The bench number and the quality tables were
describing two different systems.

The fix is a QUALITY-ADAPTIVE budget, not a bigger fixed one: hold the model
-evaluation budget roughly constant where degradation is heavy (the stride-5
compute point, quality-validated at q<=30 in results/r1_webp_attn32 and
results/r2_parity), and spend finer steps exactly where the fixed stride was
too coarse. Since init_t already shrinks as quality rises
(init_t = clamp((100-q)/100*steps, ...), webp_training.py:561-562), capping
evaluations at 14 makes the derived stride fall from 6 (q0, init_t 80) to 1
(q>=80, init_t <= 20) automatically — at the high-quality end the policy
simply IS the reference solver, whose per-image cost there is small anyway.

The reference has no such layer (its solver always runs every step,
webp_training.py:437); this module is the single source of truth for the
production solver used by evaluate --solver auto and serve.

Validated in results/r3: <codec>_me14 vs <codec>_ref hold the stride-1 gain
across the published quality grids (see results/r3/PARITY_TABLE.md), at the
same bench throughput as the old fixed config at q30 (bench_me14).
"""

from __future__ import annotations

from typing import Dict

# Model-evaluation budget per restore. 14 = the stride-5 compute point at
# q30 (init_t 70 / 5), the config whose throughput set the 216 img/s bench
# row — the policy keeps that cost where it was validated and only ever
# spends LESS at higher qualities.
PRODUCTION_MAX_EVALS = 14

# Encoder-propagation reuse (arXiv:2312.09608) while degradation is heavy;
# off near-lossless where the few remaining steps each have to count and
# the halved encoder cost no longer buys a meaningful speedup.
ENCODER_REUSE_BELOW_QUALITY = 70


def production_solver_config(quality) -> Dict[str, int]:
    """Solver kwargs for a production restore at `quality` (scalar; serving
    buckets per-file estimates first, cli/serve.py quality_for)."""
    q = float(quality)
    return {
        "max_evals": PRODUCTION_MAX_EVALS,
        "encoder_reuse": 2 if q < ENCODER_REUSE_BELOW_QUALITY else 1,
    }
