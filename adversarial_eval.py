"""Adversarial alignment-quality sweep: engine vs serial referee under
controlled nuisances (VERDICT r2 item 6).

Sweeps the registration engine and the full-budget serial numpy referee
(bench._np_solve_pair — the reference-equivalent per-pair CLIPPER) over
synthetic submap pairs per nuisance level: heavy odometry drift (center
noise), 180-degree yaw revisits, duplicated/mirror-symmetric object
layouts, and low-overlap pairs — plus matched no-overlap negatives per
scenario. Reports LC precision/recall per scenario for both solvers
(reference evaluator semantics: predicted = >= min_assoc associations;
correct = T within thresholds — roman/align/evaluate.py:233-288).

Usage:  python adversarial_eval.py [--cpu] [--pairs N] [--seeds K]
                                   [--md docs/ADVERSARIAL.md]
`--pairs` is the TOTAL positive count per scenario, split across
`--seeds` independent seeds (negatives = 2/3 of positives, also split).
Counts (tp/fp/fn) are accumulated across seeds and reported with Wilson
95% binomial confidence intervals, mirroring the reference evaluator's
bucketed statistics (roman/align/evaluate.py:211-322). Prints one JSON
line per scenario and (optionally) writes the markdown table quoted in
the docs.
"""

import argparse
import json
import os

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/roman_tpu_jax_cache")


SCENARIOS = [
    # (name, positive-pair kwargs) — negatives reuse the kwargs with the
    # common block removed
    ("baseline", dict(center_noise=0.1)),
    ("drift_0.3m", dict(center_noise=0.3)),
    ("drift_0.6m", dict(center_noise=0.6)),
    ("drift_1.0m", dict(center_noise=1.0)),
    ("yaw_180", dict(center_noise=0.2, yaw=np.pi)),
    ("duplicates_50pct", dict(center_noise=0.2, dup_frac=0.5)),
    ("symmetric_layout", dict(center_noise=0.2, symmetric=True)),
    ("low_overlap", dict(center_noise=0.2, n_common=6,
                         n_only1=17, n_only2=17)),
]


def build_pairs(rng, kwargs, n_pos, n_neg, capacity, desc_dim):
    from roman_tpu.sim import world

    base = dict(n_common=14, n_only1=8, n_only2=8, desc_dim=desc_dim)
    base.update(kwargs)
    problems = [world.make_pair_problem(rng, **base) for _ in range(n_pos)]
    neg = dict(base, n_common=0, dup_frac=0.0, symmetric=False)
    neg["n_only1"] = base["n_common"] + base["n_only1"]
    neg["n_only2"] = base["n_common"] + base["n_only2"]
    problems += [world.make_pair_problem(rng, **neg) for _ in range(n_neg)]
    labels = np.array([1] * n_pos + [0] * n_neg, bool)
    pads = [world.pad_problem(p, capacity) for p in problems]
    return problems, pads, labels


def engine_solve(pads, cfg, chunk=64):
    """Batched XLA solves over all pairs of a scenario (chunked so large
    --pairs sweeps stay within host/CPU-backend memory)."""
    import jax.numpy as jnp

    from roman_tpu.align import registration

    counts, Ts, oks = [], [], []
    for lo in range(0, len(pads), chunk):
        part = pads[lo:lo + chunk]

        def stack(key):
            return jnp.asarray(np.stack([p[key] for p in part]))

        f1 = registration.build_features(
            stack("centers1"), stack("valid1"), cfg, pca_attrs=stack("pca1"),
            volume=stack("volume1"), extent=stack("extent1"),
            descriptors=stack("desc1"))
        f2 = registration.build_features(
            stack("centers2"), stack("valid2"), cfg, pca_attrs=stack("pca2"),
            volume=stack("volume2"), extent=stack("extent2"),
            descriptors=stack("desc2"))
        res = registration.register_clipper_rescued(f1, f2, cfg)
        counts.append(np.asarray(res.count))
        Ts.append(np.asarray(res.T_align))
        oks.append(np.asarray(res.ok))
    return (np.concatenate(counts), np.concatenate(Ts), np.concatenate(oks))


def referee_solve(problems, cfg):
    import bench

    counts, Ts = [], []
    for p in problems:
        r1 = np.concatenate([p.pca1, p.volume1[:, None]], axis=1)
        r2 = np.concatenate([p.pca2, p.volume2[:, None]], axis=1)
        sel, T = bench._np_solve_pair(p.centers1, r1, p.desc1,
                                      p.centers2, r2, p.desc2, cfg)
        counts.append(len(sel))
        Ts.append(T if T is not None else np.eye(4))
    return np.asarray(counts), np.stack(Ts)


def lc_counts(counts, Ts, problems, labels, min_assoc=4,
              dist_thresh=3.0, angle_thresh_deg=10.0):
    """Raw (tp, fp, fn) so multi-seed runs can pool before dividing."""
    from roman_tpu.ops import se3_np

    tp = fp = fn = 0
    for k, p in enumerate(problems):
        predicted = counts[k] >= min_assoc
        good = False
        if predicted and np.isfinite(Ts[k]).all():
            T_hat = se3_np.transform_rm_roll_pitch(Ts[k])
            err = np.linalg.inv(T_hat) @ p.T_gt
            good = (np.linalg.norm(err[:3, 3]) < dist_thresh
                    and np.degrees(se3_np.rotation_magnitude(err[:3, :3]))
                    < angle_thresh_deg)
        if predicted and labels[k] and good:
            tp += 1
        else:
            if predicted:
                fp += 1
            if labels[k]:
                fn += 1
    return tp, fp, fn


def wilson_ci(k, n, z=1.96):
    """Wilson score 95% interval for a binomial proportion k/n."""
    if n == 0:
        return (0.0, 1.0)
    p = k / n
    denom = 1.0 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return (max(0.0, center - half), min(1.0, center + half))


def _pr_with_ci(tp, fp, fn):
    p = tp / max(tp + fp, 1)
    r = tp / max(tp + fn, 1)
    p_ci = wilson_ci(tp, tp + fp)
    r_ci = wilson_ci(tp, tp + fn)
    return p, r, p_ci, r_ci


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pairs", type=int, default=24,
                    help="TOTAL positive pairs per scenario, split across"
                         " --seeds (negatives = 2/3)")
    ap.add_argument("--seeds", type=int, default=1,
                    help="independent seeds the pair budget is split over")
    ap.add_argument("--capacity", type=int, default=40)
    ap.add_argument("--desc-dim", type=int, default=128)
    ap.add_argument("--md", type=str, default=None,
                    help="write the markdown table here")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--restarts", type=int, default=1,
                    help="engine ClipperSolveParams.n_restarts (the "
                         "referee stays single-start by design)")
    ap.add_argument("--no-referee", action="store_true",
                    help="skip the serial referee (engine-only rows; use "
                         "when the referee columns of a prior run at the "
                         "same --pairs/--seeds/--seed apply unchanged)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from roman_tpu.align.clipper import ClipperSolveParams
    from roman_tpu.align.registration import RegistrationConfig

    cfg = RegistrationConfig(
        method="roman", cos_min=0.5, cos_max=0.9, use_pallas=False,
        solver=ClipperSolveParams(n_restarts=args.restarts))
    n_pos_total = args.pairs
    n_neg_total = max(args.pairs * 2 // 3, 4)
    seed_list = [args.seed + 1000 * s for s in range(max(args.seeds, 1))]
    rows = []
    for name, kwargs in SCENARIOS:
        etp = efp = efn = btp = bfp = bfn = 0
        n_pairs = 0
        for si, seed in enumerate(seed_list):
            # split the budget as evenly as possible across seeds
            n_pos = n_pos_total // len(seed_list) + (
                1 if si < n_pos_total % len(seed_list) else 0)
            n_neg = n_neg_total // len(seed_list) + (
                1 if si < n_neg_total % len(seed_list) else 0)
            if n_pos == 0 and n_neg == 0:
                continue
            rng = np.random.default_rng(seed)
            problems, pads, labels = build_pairs(
                rng, kwargs, n_pos, n_neg, args.capacity, args.desc_dim)
            n_pairs += len(labels)
            e_counts, e_T, _ = engine_solve(pads, cfg)
            tp, fp, fn = lc_counts(e_counts, e_T, problems, labels)
            etp += tp; efp += fp; efn += fn
            if not args.no_referee:
                b_counts, b_T = referee_solve(problems, cfg)
                tp, fp, fn = lc_counts(b_counts, b_T, problems, labels)
                btp += tp; bfp += fp; bfn += fn
        e_p, e_r, e_pci, e_rci = _pr_with_ci(etp, efp, efn)
        row = dict(scenario=name, pairs=int(n_pairs),
                   positives=int(etp + efn), seeds=len(seed_list),
                   engine_precision=round(e_p, 3), engine_recall=round(e_r, 3),
                   engine_p_ci=[round(x, 3) for x in e_pci],
                   engine_r_ci=[round(x, 3) for x in e_rci])
        if not args.no_referee:
            b_p, b_r, b_pci, b_rci = _pr_with_ci(btp, bfp, bfn)
            row.update(referee_precision=round(b_p, 3),
                       referee_recall=round(b_r, 3),
                       referee_p_ci=[round(x, 3) for x in b_pci],
                       referee_r_ci=[round(x, 3) for x in b_rci])
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.md:
        lines = [
            "# Adversarial alignment-quality sweep",
            "",
            "Engine (batched XLA path; pallas is bit-equal) vs the"
            " full-budget serial numpy referee on synthetic submap pairs"
            " per nuisance level, with matched no-overlap negatives"
            f" ({n_pos_total} positives + {n_neg_total} negatives per"
            f" scenario pooled over {len(seed_list)} independent seeds,"
            f" capacity {args.capacity}, {args.desc_dim}-d descriptors;"
            " LC = >=4 associations, correct = <3 m / <10 deg vs GT)."
            " Brackets are Wilson 95% binomial CIs on the pooled counts.",
            "",
            f"Generated by `python adversarial_eval.py --pairs {args.pairs}"
            f" --seeds {args.seeds}"
            + (" --cpu" if args.cpu else "")
            + (f" --restarts {args.restarts}" if args.restarts > 1 else "")
            + f" --seed {args.seed}`.",
            "",
            "| Scenario | Engine P | Engine R | Referee P | Referee R |",
            "|---|---|---|---|---|",
        ]

        def _fmt(v, ci):
            return f"{v} [{ci[0]:.3f}, {ci[1]:.3f}]"

        for r in rows:
            # engine-only runs (--no-referee) must not render a fake
            # referee column: a 0.0 there reads as a catastrophic
            # referee failure, not "not measured"
            ref_p = (_fmt(r["referee_precision"], r["referee_p_ci"])
                     if "referee_precision" in r else "— (not run)")
            ref_r = (_fmt(r["referee_recall"], r["referee_r_ci"])
                     if "referee_recall" in r else "— (not run)")
            lines.append(
                f"| {r['scenario']} |"
                f" {_fmt(r['engine_precision'], r['engine_p_ci'])} |"
                f" {_fmt(r['engine_recall'], r['engine_r_ci'])} |"
                f" {ref_p} | {ref_r} |")
        lines += [
            "",
            "At drift_1.0m every remaining engine/referee disagreement was"
            " dissected (tests/test_rescue.py fixtures): both solvers pick"
            " 4-association sets that are 100% genuine GT matches, and the"
            " P/R deltas come from which genuine subset each happens to"
            " round to — at 1 m per-object center noise the Arun transform"
            " over 4 points lands a coin flip around the 3 m correctness"
            " threshold (observed 1.3 m vs 3.8 m on the same pair from two"
            " different genuine 4-sets). Unconverged solves (the engine's"
            " one structural failure mode here, eigenvector localized on a"
            " single node) are detected via the converged flag and"
            " re-solved at RESCUE_SOLVER budget.",
        ]
        os.makedirs(os.path.dirname(args.md) or ".", exist_ok=True)
        with open(args.md, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"# wrote {args.md}", flush=True)


if __name__ == "__main__":
    main()
