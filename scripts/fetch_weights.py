#!/usr/bin/env python
"""Weights-day runbook: fetch -> pin -> convert -> verify, one command.

The build environment is ZERO-EGRESS (verified: DNS failure to the hub),
so no published checkpoint exists in this repo — but every conversion rule
is coverage- and torch-numerics-tested offline (tests/test_convert.py,
tests/test_torch_parity.py). This script makes real-weights day mechanical:

  python scripts/fetch_weights.py --dry-run            # offline: plan + checks
  python scripts/fetch_weights.py --family animatediff # fetch + pin + convert
  python scripts/fetch_weights.py --all                # everything
  python scripts/fetch_weights.py --verify             # post-convert test gate

Mechanics:
  * MANIFEST maps each family to its published hub artifacts (the exact
    repos the reference loads: experiments/01_baseline_generation.py:55-73,
    05:121-147) and to the scripts/convert_checkpoint.py invocation.
  * First successful fetch computes sha256 per file and writes
    ``ckpts/weights.lock.json`` (atomic); later fetches VERIFY against the
    lock — a changed upstream file fails loudly instead of silently
    converting different weights.
  * Repo file layouts drift across hub revisions; each file entry lists
    fallback candidate paths tried in order (recorded in the lock).
  * --verify runs the weight-gated test tier (tests/test_real_weights.py,
    VDX_WEIGHTS_DIR) and prints the random-weight re-validation list —
    every measured quality curve in PERF.md that must be re-run on real
    weights.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

HF = "https://huggingface.co/{repo}/resolve/main/{path}"

# component -> list of (repo, [candidate paths tried in order]).
# Multiple entries for one component MERGE into one state dict (the
# convert CLI's repeated --src), e.g. SD-1.5 UNet + motion adapter.
MANIFEST = {
    "animatediff": {
        "files": {
            "unet": [
                ("runwayml/stable-diffusion-v1-5",
                 ["unet/diffusion_pytorch_model.safetensors"]),
                ("guoyww/animatediff-motion-adapter-v1-5-2",
                 ["diffusion_pytorch_model.safetensors"]),
            ],
            "vae": [
                ("runwayml/stable-diffusion-v1-5",
                 ["vae/diffusion_pytorch_model.safetensors"]),
            ],
            "text": [
                ("runwayml/stable-diffusion-v1-5",
                 ["text_encoder/model.safetensors"]),
            ],
        },
        "tokenizer": [
            ("runwayml/stable-diffusion-v1-5",
             ["tokenizer/vocab.json"]),
            ("runwayml/stable-diffusion-v1-5",
             ["tokenizer/merges.txt"]),
        ],
    },
    "modelscope": {
        "files": {
            "unet": [
                ("ali-vilab/text-to-video-ms-1.7b",
                 ["unet/diffusion_pytorch_model.safetensors",
                  "unet/diffusion_pytorch_model.fp16.safetensors"]),
            ],
            "vae": [
                ("ali-vilab/text-to-video-ms-1.7b",
                 ["vae/diffusion_pytorch_model.safetensors",
                  "vae/diffusion_pytorch_model.fp16.safetensors"]),
            ],
            "text": [
                ("ali-vilab/text-to-video-ms-1.7b",
                 ["text_encoder/model.safetensors",
                  "text_encoder/model.fp16.safetensors"]),
            ],
        },
    },
    "svd": {
        "files": {
            "unet": [
                ("stabilityai/stable-video-diffusion-img2vid-xt",
                 ["unet/diffusion_pytorch_model.safetensors",
                  "unet/diffusion_pytorch_model.fp16.safetensors"]),
            ],
            # the hub "vae" file is AutoencoderKLTemporalDecoder: its
            # encoder feeds our "vae" component, its temporal decoder our
            # "tdec" — one download, two --src targets
            "vae": [
                ("stabilityai/stable-video-diffusion-img2vid-xt",
                 ["vae/diffusion_pytorch_model.safetensors",
                  "vae/diffusion_pytorch_model.fp16.safetensors"]),
            ],
            "tdec": [
                ("stabilityai/stable-video-diffusion-img2vid-xt",
                 ["vae/diffusion_pytorch_model.safetensors",
                  "vae/diffusion_pytorch_model.fp16.safetensors"]),
            ],
            "vision": [
                ("stabilityai/stable-video-diffusion-img2vid-xt",
                 ["image_encoder/model.safetensors",
                  "image_encoder/model.fp16.safetensors"]),
            ],
        },
    },
    "latte": {
        "files": {
            "unet": [
                ("maxin-cn/Latte-1",
                 ["transformer/diffusion_pytorch_model.safetensors"]),
            ],
            "vae": [
                ("maxin-cn/Latte-1",
                 ["vae/diffusion_pytorch_model.safetensors"]),
            ],
            "text": [
                ("maxin-cn/Latte-1",
                 ["text_encoder/model.safetensors"]),
            ],
        },
    },
    "cogvideox": {
        "files": {
            "dit": [
                ("THUDM/CogVideoX-2b",
                 ["transformer/diffusion_pytorch_model.safetensors"]),
            ],
            "t5": [
                # sharded T5-XXL: every shard merges into one state dict
                ("THUDM/CogVideoX-2b",
                 ["text_encoder/model-00001-of-00002.safetensors"]),
                ("THUDM/CogVideoX-2b",
                 ["text_encoder/model-00002-of-00002.safetensors"]),
            ],
            "vae_enc": [
                ("THUDM/CogVideoX-2b",
                 ["vae/diffusion_pytorch_model.safetensors"]),
            ],
            "vae_dec": [
                ("THUDM/CogVideoX-2b",
                 ["vae/diffusion_pytorch_model.safetensors"]),
            ],
        },
    },
    # metrics oracle: LPIPS(alex) = torchvision AlexNet features + the
    # published linear heads (reference experiments/06:122-154). Pins the
    # 16 grid_search_results.json perceptual fields + the lpips terms of
    # consistency_score that random weights cannot reproduce.
    "lpips": {
        "raw": [
            ("https://download.pytorch.org/models/alexnet-owt-7be5be79.pth",
             "alexnet-owt-7be5be79.pth"),
            ("https://github.com/richzhang/PerceptualSimilarity/raw/master/"
             "lpips/weights/v0.1/alex.pth",
             "lpips_alex_v0.1.pth"),
        ],
    },
}

#: PERF.md quality numbers measured on seeded-random weights — re-run on
#: real weights (thresholds/intervals may re-tune; PERF.md notes which).
REVALIDATE = [
    "scripts/pab_quality_curves.py      # PAB drift curves (39-41 dB)",
    "scripts/skip_quality_curves.py     # skip thresholds (50.4/42.7 dB)",
    "scripts/bench_ad_sampler.py        # dpm:16 == ddim:25 equivalence",
    "scripts/bench_svd_sampler.py       # dpm_edm:12 trajectory accuracy",
    "scripts/svd_skip_drift.py          # SVD skip 40.2 dB @ thr 0.12",
    "scripts/bench_skip_dpm.py          # stacked skip x dpm frontier",
    "scripts/bench_freeu.py             # FreeU on real features",
]


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for blk in iter(lambda: f.read(1 << 20), b""):
            h.update(blk)
    return h.hexdigest()


def _atomic_json(path: Path, obj) -> None:
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_text(json.dumps(obj, indent=2, sort_keys=True))
    os.replace(tmp, path)


def _fetch(url: str, dest: Path) -> bool:
    """Stream url -> dest (atomic). Returns False on HTTP 404 so candidate
    paths can fall through; raises on network-level failure."""
    import urllib.error
    import urllib.request

    tmp = dest.with_name(dest.name + ".part")
    try:
        with urllib.request.urlopen(url, timeout=60) as r, open(tmp, "wb") as f:
            while True:
                blk = r.read(1 << 20)
                if not blk:
                    break
                f.write(blk)
    except urllib.error.HTTPError as e:
        if e.code == 404:
            return False
        raise
    os.replace(tmp, dest)
    return True


def plan(families) -> list:
    """(family, component, repo, candidates, local_name) rows."""
    rows = []
    for fam in families:
        entry = MANIFEST[fam]
        for comp, sources in entry.get("files", {}).items():
            for i, (repo, candidates) in enumerate(sources):
                local = f"{fam}/{comp}_{i}_" + Path(candidates[0]).name
                rows.append((fam, comp, repo, candidates, local))
        for repo, candidates in entry.get("tokenizer", []):
            local = f"{fam}/tokenizer_" + Path(candidates[0]).name
            rows.append((fam, "tokenizer", repo, candidates, local))
        for url, name in entry.get("raw", []):
            rows.append((fam, "raw", url, [None], f"{fam}/{name}"))
    return rows


def dry_run(families, raw_dir: Path) -> int:
    """Offline validation: manifest completeness vs the convert CLI's
    component lists, the conversion invocations, and the fetch plan."""
    from scripts.convert_checkpoint import FAMILIES as CONVERT_FAMILIES

    comp_expect = {
        "animatediff": {"unet", "vae", "text"},
        "modelscope": {"unet", "vae", "text"},
        "latte": {"unet", "vae", "text"},
        "svd": {"unet", "vae", "tdec", "vision"},
        "cogvideox": {"dit", "t5", "vae_enc", "vae_dec"},
    }
    bad = 0
    for fam in families:
        if fam == "lpips":
            continue
        if fam not in CONVERT_FAMILIES:
            print(f"FAIL {fam}: not a convert_checkpoint family")
            bad += 1
            continue
        have = set(MANIFEST[fam]["files"])
        want = comp_expect[fam]
        if have != want:
            print(f"FAIL {fam}: manifest components {sorted(have)} != "
                  f"converter components {sorted(want)}")
            bad += 1
    rows = plan(families)
    print(f"\nFetch plan ({len(rows)} artifacts -> {raw_dir}):")
    for fam, comp, repo, candidates, local in rows:
        url = repo if comp == "raw" else HF.format(repo=repo, path=candidates[0])
        alt = f" (+{len(candidates) - 1} fallback)" if len(candidates) > 1 else ""
        print(f"  [{fam}/{comp}] {url}{alt}")
    print("\nPost-fetch conversions:")
    for fam in families:
        if fam != "lpips":
            print("  " + " ".join(convert_argv(fam, raw_dir, raw_dir.parent)))
    print("\nPost-convert verification:")
    print("  VDX_WEIGHTS_DIR=ckpts VDX_REQUIRE_GOLDEN=1 "
          "python -m pytest tests/test_real_weights.py -v")
    print("\nRandom-weight curves to re-validate (PERF.md):")
    for line in REVALIDATE:
        print("  " + line)
    print("\nDRY RUN " + ("FAILED" if bad else "OK") +
          " — no network access attempted")
    return bad


def convert_argv(fam: str, raw_dir: Path, out_root: Path) -> list:
    argv = [sys.executable, "scripts/convert_checkpoint.py",
            "--family", fam, "--out", str(out_root / fam)]
    for comp, sources in MANIFEST[fam]["files"].items():
        for i, (repo, candidates) in enumerate(sources):
            local = raw_dir / f"{fam}/{comp}_{i}_{Path(candidates[0]).name}"
            argv += ["--src", f"{comp}={local}"]
    return argv


def fetch(families, raw_dir: Path, lock_path: Path) -> int:
    lock = json.loads(lock_path.read_text()) if lock_path.exists() else {}
    failures = 0
    for fam, comp, repo, candidates, local in plan(families):
        dest = raw_dir / local
        dest.parent.mkdir(parents=True, exist_ok=True)
        if dest.exists() and local in lock:
            if _sha256(dest) == lock[local]["sha256"]:
                print(f"  ok (cached, pinned) {local}")
                continue
            print(f"FAIL {local}: on-disk file does not match the lock")
            failures += 1
            continue
        got = None
        for cand in candidates:
            url = repo if cand is None else HF.format(repo=repo, path=cand)
            print(f"  fetching {url}")
            if _fetch(url, dest):
                got = url
                break
        if got is None:
            print(f"FAIL {local}: no candidate path exists upstream — "
                  "pin the current repo layout into MANIFEST")
            failures += 1
            continue
        digest = _sha256(dest)
        if local in lock and lock[local]["sha256"] != digest:
            print(f"FAIL {local}: upstream file changed since it was "
                  f"pinned ({digest[:12]} != {lock[local]['sha256'][:12]})")
            failures += 1
            continue
        lock[local] = {"sha256": digest, "url": got,
                       "bytes": dest.stat().st_size}
        _atomic_json(lock_path, lock)
        print(f"  pinned {local} sha256={digest[:12]}")
    return failures


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--family", action="append", choices=sorted(MANIFEST),
                    help="repeatable; default = every family + lpips")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--out", default="ckpts", help="checkpoint root")
    ap.add_argument("--dry-run", action="store_true",
                    help="offline: validate manifest + print the full plan")
    ap.add_argument("--no-convert", action="store_true")
    ap.add_argument("--verify", action="store_true",
                    help="run the weight-gated test tier and exit")
    args = ap.parse_args(argv)

    out_root = REPO / args.out
    raw_dir = out_root / "_raw"
    families = args.family or sorted(MANIFEST)

    if args.verify:
        env = dict(os.environ, VDX_WEIGHTS_DIR=str(out_root),
                   VDX_REQUIRE_GOLDEN="1")
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "tests/test_real_weights.py",
             "-v"], env=env, cwd=REPO)
        print("\nRe-validate on real weights (PERF.md random-weight curves):")
        for line in REVALIDATE:
            print("  " + line)
        return rc

    if args.dry_run:
        return dry_run(families, raw_dir)

    out_root.mkdir(parents=True, exist_ok=True)
    failures = fetch(families, raw_dir, out_root / "weights.lock.json")
    if failures:
        print(f"\n{failures} artifacts failed — fix and re-run (fetch is "
              "idempotent; pinned files are skipped)")
        return 1
    if not args.no_convert:
        for fam in families:
            if fam == "lpips":
                continue
            print(f"\n=== convert {fam} ===")
            rc = subprocess.call(convert_argv(fam, raw_dir, out_root),
                                 cwd=REPO)
            if rc != 0:
                return rc
    print("\nAll weights fetched, pinned, and converted. Now:")
    print("  python scripts/fetch_weights.py --verify")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
