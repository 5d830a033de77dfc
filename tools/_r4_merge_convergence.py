#!/usr/bin/env python3
"""Round-4 one-shot: merge the re-run AWN stage into the committed
TIMIT-shaped convergence story.

Keeps the r3 boot/full trajectories, relabels the r3 collapsed AWN
stage (reference sigma0=0.075, lambda=1/N — the docs/AWN_NOTES.md
pathology) as `awn_failed_ref_defaults`, appends the healthy re-run
(sigma0=0.01, lambda=7.8e-7) as `awn`, and records the comparison in
meta.notes.
"""

import json

main = json.load(open("runs/convergence_timit_shape.json"))
rerun = json.load(open("runs/convergence_awn_rerun.json"))

kept = [r for r in main["trajectory"] if r.get("stage") in ("boot", "full")]
failed = [dict(r, stage="awn_failed_ref_defaults")
          for r in main["trajectory"] if r.get("stage") == "awn"]
new = [dict(r, stage="awn") for r in rerun["trajectory"]]

full_pers = [r["valid_per"] for r in kept if r.get("valid_per") is not None]
awn_pers = [r["valid_per"] for r in new if r.get("valid_per") is not None]

meta = main["meta"]
meta["recipe"] = rerun["meta"]["recipe"]
meta["notes"] = {
    "awn_failed_ref_defaults": (
        "stage 3 at the reference defaults (sigma0=0.075, lambda=1/4000) "
        "collapses the trained model to the unigram plateau within one "
        "epoch and never recovers (200 epochs) — root cause and "
        "measurements in docs/AWN_NOTES.md (sigma0 is a from-scratch "
        "scale; adadelta gives the consistent KL mu-pull scale-invariant "
        "steps). A sigma0=0.01 rerun at lambda=1/4000 collapsed "
        "identically via the KL pull alone (|mu| 83.5 -> 0.8 in 200 "
        "steps, sigma unchanged)."
    ),
    "awn": (
        "stage 3 rerun from full/ckpt_best_valid_PER at sigma0=0.01, "
        "lambda=7.8125e-7 (the docs/AWN_NOTES.md stable operating "
        "point)."
    ),
    "best_valid_per_no_awn": min(full_pers) if full_pers else None,
    "best_valid_per_awn": min(awn_pers) if awn_pers else None,
}
if awn_pers and full_pers:
    comparison = (
        "AWN beats the no-AWN PER"
        if min(awn_pers) < min(full_pers)
        else "AWN does NOT beat the no-AWN PER"
    )
    meta["notes"]["verdict"] = (
        f"{comparison}: best no-AWN {min(full_pers):.4f} vs best AWN "
        f"{min(awn_pers):.4f} (held-out beam K=5, 61->39 fold)."
    )
else:
    meta["notes"]["verdict"] = (
        "incomplete: a stage produced no decoded epochs "
        f"(no-AWN PER rows: {len(full_pers)}, AWN PER rows: {len(awn_pers)})"
    )

main["trajectory"] = kept + failed + new
with open("runs/convergence_timit_shape.json", "w") as f:
    json.dump(main, f, indent=1)
print(meta["notes"]["verdict"])
print("stages:", {s: sum(1 for r in main["trajectory"] if r["stage"] == s)
                  for s in ("boot", "full", "awn_failed_ref_defaults", "awn")})
