"""ICI communication analysis: ring vs Ulysses frame sharding.

Answers the VERDICT r2 concern that the 8-chip north-star projection
"silently assumes comm overlaps compute": computes the exact per-device ICI
traffic of the frame-sharded denoise step for both temporal-parallelism
modes (nn/temporal.py) and bounds the UN-overlapped communication time
against the measured per-shard compute, so the projection holds without
any overlap assumption.

Pure arithmetic from the model configs — no device needed.

Topology/bandwidth model: TPU v5e, 2D torus, ~45 GB/s one-way per ICI
link (public figure; the scaling-book mental model). Ring attention's KV
rotation is nearest-neighbour traffic (1 link, fully parallel across
devices); all-to-all on a worst-case 1D ring costs an average hop distance
of n/4, which we charge explicitly (a 2x4 torus does better).
"""

from __future__ import annotations

BW = 45e9  # bytes/s one-way per ICI link (v5e public figure)


def svd_temporal_sites(H_lat, W_lat, B=2):
    """(positions, channels, n_temporal_blocks) per level of the SVD UNet
    (models/svd_unet.py svd() config: channels (320,640,1280,1280),
    layers_per_block=2, attn at down levels 0-2 + mid + up levels 1-3)."""
    chans = [320, 640, 1280, 1280]
    sites = []
    # down: levels 0..2 have attention, 2 layers each
    for lvl in range(3):
        hw = (H_lat >> lvl) * (W_lat >> lvl)
        sites += [(B * hw, chans[lvl])] * 2
    # mid: 1 transformer at the deepest resolution
    hw = (H_lat >> 3) * (W_lat >> 3)
    sites += [(B * hw, chans[3])]
    # up: levels with attn mirror the down ones, 3 layers each
    for lvl in (2, 1, 0):
        hw = (H_lat >> lvl) * (W_lat >> lvl)
        sites += [(B * hw, chans[lvl])] * 3
    return sites


def unet_motion_sites(H_lat, W_lat, B=2):
    """AnimateDiff UNetMotion (sd15): motion module after every attn level;
    channels (320,640,1280,1280), 2 layers down / 3 up, motion at ALL four
    levels (down 0-3, mid, up 0-3) — models/unet_motion.py."""
    chans = [320, 640, 1280, 1280]
    sites = []
    for lvl in range(4):
        hw = (H_lat >> lvl) * (W_lat >> lvl)
        sites += [(B * hw, chans[lvl])] * 2
    hw = (H_lat >> 3) * (W_lat >> 3)
    sites += [(B * hw, chans[3])]
    for lvl in (3, 2, 1, 0):
        hw = (H_lat >> lvl) * (W_lat >> lvl)
        sites += [(B * hw, chans[lvl])] * 3
    return sites


def analyze(name, sites, F, n, fwd_ms, steps, attns_per_block=2):
    F_pad = ((F + n - 1) // n) * n
    f_local = F_pad // n
    ring = ulysses = 0.0
    for positions, C in sites:
        local = positions * f_local * C * 2  # one bf16 tensor, local shard
        # ring: per attention, K and V each visit every other device
        ring += attns_per_block * 2 * (n - 1) * local
        # ulysses: two all_to_alls around the WHOLE temporal block
        ulysses += 2 * (n - 1) / n * local
    ring_t = ring / BW
    # worst-case 1D-ring routing of the all-to-all: avg hop distance n/4
    uly_t = ulysses * (n / 4) / BW
    comp = fwd_ms / 1e3 / n * (F_pad / F)  # padded frames cost compute too
    print(f"\n{name}  (F={F} -> padded {F_pad}, n={n}, sites={len(sites)})")
    print(f"  per-device send volume/fwd: ring {ring/1e6:8.1f} MB   "
          f"ulysses {ulysses/1e6:7.1f} MB   ratio {ring/ulysses:.1f}x")
    print(f"  un-overlapped link time/fwd: ring {ring_t*1e3:7.1f} ms   "
          f"ulysses {uly_t*1e3:6.2f} ms (x n/4 ring routing)")
    print(f"  per-device compute/fwd: {comp*1e3:7.1f} ms "
          f"(measured {fwd_ms} ms / {n} chips, padded-frame adjusted)")
    for label, t in (("ring", ring_t), ("ulysses", uly_t)):
        total = steps * (comp + t)
        tax = t / comp * 100
        print(f"  {label:8s}: denoise {steps} steps = {total:5.2f} s "
              f"({tax:5.1f}% comm tax, zero overlap assumed)")


if __name__ == "__main__":
    # SVD north star: 25f @576x1024 (latents 72x128), 25 EDM steps,
    # fwd 1905 ms measured single-chip (PERF.md round 3)
    analyze("SVD 576x1024x25f", svd_temporal_sites(72, 128), F=25, n=8,
            fwd_ms=1905.6, steps=25)
    # AnimateDiff bench: 16f @512^2 (latents 64x64), 25 steps, fwd 420 ms
    analyze("AnimateDiff 512^2x16f", unet_motion_sites(64, 64), F=16, n=8,
            fwd_ms=420.5, steps=25)
