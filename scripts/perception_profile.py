"""Decompose PerceptionFrontend.run_batch wall time through the tunnel.

VERDICT r4 #5: 12.6 fps at batch 8 "smells transfer-dominated, but
nothing measures it". This script times each segment separately on the
real chip:

  upload     host->device transfer of the uint8 images + f16 depths
  compute    the jitted program with device-resident inputs
  fetch      device->host transfer of the two packed result buffers
  unpack     host-side reshape/threshold of the packed buffers

Run: python scripts/perception_profile.py  (needs the axon TPU)
Feeds docs/PERF.md "Where the perception time goes".
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(batch=8, height=480, width=640, repeats=5):
    import jax
    import jax.numpy as jnp

    from roman_tpu.data.camera import CameraParams
    from roman_tpu.params.fastsam_params import FastSAMParams
    from roman_tpu.perception.wrapper import PerceptionFrontend

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    cam = CameraParams.simple(width=width, height=height)
    params = FastSAMParams(imgsz=(256, 256), batch_frames=batch,
                           max_masks_per_frame=64, max_points_per_mask=256)
    fe = PerceptionFrontend(params, cam)
    rng = np.random.default_rng(0)
    imgs_f = rng.uniform(size=(batch, height, width, 3)).astype(np.float32)
    depths = rng.uniform(1.0, 6.0, size=(batch, height, width)).astype(np.float32)

    # --- end-to-end (the bench's number) ---
    fe.run_batch(imgs_f, depths)  # compile
    e2e = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        fe.run_batch(imgs_f, depths)
        e2e = min(e2e, time.perf_counter() - t0)

    # --- segment timings ---
    imgs_u8 = np.clip(imgs_f * 255.0, 0, 255).astype(np.uint8)
    depths_f16 = depths.astype(np.float16)
    tri = fe._tri_mask(height, width)
    jit = fe._jitted
    variables = fe._variables()

    def timed(fn, reps=repeats):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return best, out

    # upload: images / depths / tri separately (per-array latency matters)
    up_img, d_img = timed(lambda: jax.device_put(imgs_u8, dev).block_until_ready())
    up_dep, d_dep = timed(lambda: jax.device_put(depths_f16, dev).block_until_ready())
    up_tri, d_tri = timed(lambda: jax.device_put(tri, dev).block_until_ready())

    # compute: device-resident inputs, sync after
    def compute():
        u8, f32 = jit(variables, d_img, d_dep, d_tri)
        u8.block_until_ready()
        f32.block_until_ready()
        return u8, f32

    t_comp, (u8, f32) = timed(compute)

    # fetch: each packed buffer separately
    f_u8, h_u8 = timed(lambda: np.asarray(u8))
    f_f32, h_f32 = timed(lambda: np.asarray(f32))

    # host unpack cost (run_batch tail after np.asarray)
    def unpack():
        p = fe.params
        K = p.max_masks_per_frame
        f = p.mask_downsample_factor
        P = p.max_points_per_mask
        D = fe.vit_cfg.width
        mh, mw = len(range(0, height, f)), len(range(0, width, f))
        m_end = batch * K * mh * mw
        v_end = m_end + batch * K
        masks = h_u8[:m_end].reshape(batch, K, mh, mw).astype(bool)
        valid = h_u8[m_end:v_end].reshape(batch, K).astype(bool)
        pv = h_u8[v_end:v_end + batch * K * P].reshape(batch, K, P).astype(bool)
        p_end = batch * K * P * 3
        pts = h_f32[:p_end].reshape(batch, K, P, 3)
        return masks, valid, pv, pts

    t_unpack, _ = timed(unpack)

    mb = lambda a: a.nbytes / 1e6
    rows = [
        ("upload images (u8)", up_img, mb(imgs_u8)),
        ("upload depths (f16)", up_dep, mb(depths_f16)),
        ("upload tri mask", up_tri, mb(np.asarray(tri))),
        ("compute (device-resident)", t_comp, 0.0),
        ("fetch u8 buffer", f_u8, mb(h_u8)),
        ("fetch f32 buffer", f_f32, mb(h_f32)),
        ("host unpack", t_unpack, 0.0),
    ]
    total = sum(r[1] for r in rows)
    print(f"{'segment':<28}{'ms':>9}{'MB':>9}")
    for name, t, size in rows:
        print(f"{name:<28}{t * 1e3:>9.1f}{size:>9.2f}")
    print(f"{'sum of segments':<28}{total * 1e3:>9.1f}")
    print(f"{'end-to-end run_batch':<28}{e2e * 1e3:>9.1f}")
    print(f"# blocking fps at batch {batch}: {batch / e2e:.2f}")

    # steady-state: issue the next batch's uploads while the previous
    # computes (what a pipelined driver achieves)
    n_pipe = 6
    t0 = time.perf_counter()
    pend = []
    for i in range(n_pipe):
        di = jax.device_put(imgs_u8, dev)
        dd = jax.device_put(depths_f16, dev)
        u8o, f32o = jit(variables, di, dd, d_tri)
        pend.append((u8o, f32o))
        # drain all but the most recent to bound queueing
        while len(pend) > 2:
            a, b = pend.pop(0)
            np.asarray(a), np.asarray(b)
    for a, b in pend:
        np.asarray(a), np.asarray(b)
    dt = time.perf_counter() - t0
    print(f"# pipelined fps ({n_pipe} batches in flight<=2): "
          f"{n_pipe * batch / dt:.2f}")


if __name__ == "__main__":
    main()
