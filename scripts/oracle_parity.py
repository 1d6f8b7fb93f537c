"""Full-oracle parity: reproduce the reference's entire 78-record metric
dataset from its committed frame PNGs and diff every non-LPIPS field.

The strongest completeness proof the reference hands us offline
(SURVEY.md §4): `outputs/06_grid_search_metrics/grid_search_results.json`
(reference 06:291-389 formulas, 06:430-458 schema) was produced by the
reference's own engine from the 78 committed experiment frame dirs under
`outputs/05_grid_search/`. Running OUR engine (vdx/metrics) over the same
pixels and matching every record/field proves the measurement layer
end to end — not on a 2-experiment sample, but on the whole dataset.

LPIPS-valued fields (mean_lpips, std_lpips, per-pair lpips, and
temporal_consistency_score, whose formula mixes lpips terms — reference
06:238-252) are excluded: the published AlexNet/lin weight VALUES are
env-blocked (zero egress), so our LPIPS runs random weights. Everything
else is compared: summary records AND per-pair frame metrics.

Usage:
    # 1. (once, ~10 min on CPU) run the measurement pass over the
    #    committed reference frames:
    python experiments/06_measure_grid_search.py \
        --input /root/reference/outputs/05_grid_search \
        --output /tmp/oracle_r5 --device cpu
    # 2. diff against the committed oracle + write the artifact:
    python scripts/oracle_parity.py --ours /tmp/oracle_r5 \
        --out artifacts/oracle_parity_r5.json
"""

import argparse
import json
import sys
from pathlib import Path

REFERENCE_METRICS = Path("/root/reference/outputs/06_grid_search_metrics")

# field -> rtol, grouped by metric provenance (tolerances match the
# committed golden tests in tests/test_metrics.py):
#   basics (mse/psnr/flicker: pure jnp vs torch fp32)          1e-4
#   aggregate std/var (fp64 reduction-order sensitivity)       1e-3
#   flow (from-scratch Farneback vs OpenCV C++)                2e-3
#   flow variance (variance amplifies the flow rtol ~2x)       5e-3
#   warp (map_coordinates vs grid_sample on flow inputs)       5e-3
SUMMARY_FIELDS = {
    "mean_mse": 1e-4,
    "std_mse": 1e-3,
    "flicker_index": 1e-4,
    "mean_flow_magnitude": 2e-3,
    "flow_magnitude_variance": 5e-3,
    "mean_warp_error": 5e-3,
    "warp_error_variance": 1e-2,
    "mean_psnr": 1e-4,  # only present in per-experiment files
}
EXACT_FIELDS = ["experiment_id", "video_name", "guidance_scale",
                "num_inference_steps", "phase"]
PAIR_FIELDS = {
    "mse": 1e-4,
    "psnr": 1e-4,
    "flow_magnitude_mean": 2e-3,
    "flow_magnitude_std": 2e-3,
    "warp_error": 5e-3,
}
LPIPS_FIELDS = {"mean_lpips", "std_lpips", "lpips", "temporal_consistency_score"}


def rel_err(a: float, b: float) -> float:
    if a == b:
        return 0.0
    return abs(a - b) / max(abs(b), 1e-30)


def compare(ours_dir: Path, out_path: Path) -> int:
    ref_summary = json.loads(
        (REFERENCE_METRICS / "grid_search_results.json").read_text()
    )
    our_summary = {
        r["experiment_id"]: r
        for r in json.loads((ours_dir / "grid_search_results.json").read_text())
    }

    records = []
    worst = {}  # field -> (rel_err, experiment_id)
    n_fail = 0
    n_field_checks = 0
    for ref in ref_summary:
        eid = ref["experiment_id"]
        rec = {"experiment_id": eid, "fields": {}, "ok": True}
        ours = our_summary.get(eid)
        if ours is None:
            rec["ok"] = False
            rec["error"] = "missing from our summary"
            n_fail += 1
            records.append(rec)
            continue

        for f in EXACT_FIELDS:
            if ours.get(f) != ref.get(f):
                rec["fields"][f] = {"ref": ref.get(f), "ours": ours.get(f),
                                    "ok": False}
                rec["ok"] = False

        # summary-record numeric fields
        for f, rtol in SUMMARY_FIELDS.items():
            if f not in ref:
                continue
            e = rel_err(ours[f], ref[f])
            ok = e <= rtol
            n_field_checks += 1
            rec["fields"][f] = {"rel_err": e, "rtol": rtol, "ok": ok}
            if not ok:
                rec["fields"][f].update(ref=ref[f], ours=ours[f])
                rec["ok"] = False
            if e > worst.get(f, (0, ""))[0]:
                worst[f] = (e, eid)

        # per-experiment files: top-level fields (incl. mean_psnr, which the
        # roll-up summary omits) + per-pair frame metrics
        ref_exp = json.loads((REFERENCE_METRICS / f"{eid}_metrics.json").read_text())
        our_exp = json.loads((ours_dir / f"{eid}_metrics.json").read_text())
        for f, rtol in SUMMARY_FIELDS.items():
            if f not in ref_exp or f in ref:
                continue
            e = rel_err(our_exp[f], ref_exp[f])
            ok = e <= rtol
            n_field_checks += 1
            rec["fields"][f] = {"rel_err": e, "rtol": rtol, "ok": ok}
            if not ok:
                rec["fields"][f].update(ref=ref_exp[f], ours=our_exp[f])
                rec["ok"] = False
            if e > worst.get(f, (0, ""))[0]:
                worst[f] = (e, eid)
        assert len(our_exp["frame_metrics"]) == len(ref_exp["frame_metrics"]), eid
        pair_worst = {}
        for i, (rp, op) in enumerate(
            zip(ref_exp["frame_metrics"], our_exp["frame_metrics"])
        ):
            for f, rtol in PAIR_FIELDS.items():
                e = rel_err(op[f], rp[f])
                n_field_checks += 1
                if e > pair_worst.get(f, (0, -1))[0]:
                    pair_worst[f] = (e, i)
                if e > rtol:
                    rec["ok"] = False
                    rec["fields"].setdefault("pair_failures", []).append(
                        {"pair": i, "field": f, "ref": rp[f], "ours": op[f],
                         "rel_err": e}
                    )
                key = f"pair_{f}"
                if e > worst.get(key, (0, ""))[0]:
                    worst[key] = (e, f"{eid}[{i}]")
        rec["pair_worst"] = {
            f: {"rel_err": e, "pair": i} for f, (e, i) in pair_worst.items()
        }
        if not rec["ok"]:
            n_fail += 1
        records.append(rec)

    artifact = {
        "n_records": len(ref_summary),
        "n_failed": n_fail,
        "n_field_checks": n_field_checks,
        "excluded_fields": sorted(LPIPS_FIELDS),
        "excluded_reason": "published LPIPS weight values env-blocked "
        "(zero egress); architecture torch-graph-parity tested separately",
        "tolerances": {"summary": SUMMARY_FIELDS, "per_pair": PAIR_FIELDS},
        "worst_rel_err_by_field": {
            f: {"rel_err": e, "at": at} for f, (e, at) in sorted(worst.items())
        },
        "records": records,
    }
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(artifact, indent=1))

    print(f"records: {len(ref_summary)}  failed: {n_fail}  "
          f"field checks: {n_field_checks}")
    print("worst relative error by field:")
    for f, (e, at) in sorted(worst.items()):
        print(f"  {f:28s} {e:.3e}  at {at}")
    print(f"artifact: {out_path}")
    return 1 if n_fail else 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ours", required=True, help="output dir of our 06 pass")
    p.add_argument("--out", default="artifacts/oracle_parity_r5.json")
    args = p.parse_args()
    sys.exit(compare(Path(args.ours), Path(args.out)))


if __name__ == "__main__":
    main()
