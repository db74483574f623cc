"""Build the realistic-statistics fixture checkpoint for end-to-end parity.

Random weights put the decoder on knife edges: sub-1e-4 torch-vs-XLA conv
differences cascade through `clip(round(coord/stride))` into whole-cell
keypoint jumps on low-score content, so a direct <=1 px end-to-end
assertion is impossible with them (round-2 test settled for pose-count +
top-pose). Real trained checkpoints are egress-blocked. This script makes
the closest offline approximation: starting from the tfjs-format fixture
checkpoint (converted through posenet_tpu.converter.tfjs2jax, so the
converter sits in the training provenance too), it fine-tunes the four
heads — a convex linear probe on the frozen random backbone — on the
synthesized photo set with geometric ground truth derived from the drawn
figures, until heatmaps are sharply peaked at the figures and the
offset/displacement fields are coherent. Decode then operates far from
rounding knife edges and a direct mean-deviation assertion holds across
frameworks.

Displacement heads train against the GT part-to-part vectors (the
reference trains only heatmap+offset; displacements must be coherent here
or the tree traversal stays chaotic).

Run from the repo root (CPU, ~2-4 min):
    python tests/make_fixture_checkpoint.py
writes tests/fixtures/fixture_m50_s16.npz (committed).
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from posenet_tpu.config import ModelConfig
from posenet_tpu.constants import EDGES, NUM_EDGES
from posenet_tpu.converter import tfjs2jax
from posenet_tpu.training import loss as loss_lib

HEIGHT, WIDTH, STRIDE = 353, 481, 16  # synth_photo size is stride-valid
N_IMAGES = 12
FIXTURE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'fixtures', 'fixture_m50_s16.npz')


def person_keypoints(cx: float, cy: float, s: float) -> np.ndarray:
    """17 COCO keypoints (y, x) in IMAGE px for a tfjs_fixture.synth_photo
    figure drawn at (cx, cy) with scale s (see synth_photo's geometry:
    head circle at cy-2.2s, torso cy-1.6s..cy, arms to (cx±s, ...), legs
    to cy+1.6s)."""
    kp = np.array([
        (cy - 2.2 * s, cx),                    # nose
        (cy - 2.3 * s, cx - 0.15 * s),         # left eye
        (cy - 2.3 * s, cx + 0.15 * s),         # right eye
        (cy - 2.2 * s, cx - 0.35 * s),         # left ear
        (cy - 2.2 * s, cx + 0.35 * s),         # right ear
        (cy - 1.5 * s, cx - 0.35 * s),         # left shoulder
        (cy - 1.5 * s, cx + 0.35 * s),         # right shoulder
        (cy - 0.9 * s, cx - 0.7 * s),          # left elbow
        (cy - 1.0 * s, cx + 0.7 * s),          # right elbow
        (cy - 0.4 * s, cx - s),                # left wrist
        (cy - 0.6 * s, cx + s),                # right wrist
        (cy, cx - 0.25 * s),                   # left hip
        (cy, cx + 0.25 * s),                   # right hip
        (cy + 0.8 * s, cx - 0.45 * s),         # left knee
        (cy + 0.85 * s, cx + 0.4 * s),         # right knee
        (cy + 1.6 * s, cx - 0.6 * s),          # left ankle
        (cy + 1.7 * s, cx + 0.5 * s),          # right ankle
    ], dtype=np.float64)
    return kp


def dataset():
    """(images uint8 (N,H,W,3) RGB, keypoints grid coords (N,2,17,2))."""
    from tests.tfjs_fixture import synth_photo

    imgs, kps = [], []
    h, w = HEIGHT, WIDTH
    for i in range(N_IMAGES):
        bgr = synth_photo(h, w, seed=100 + i)
        imgs.append(bgr[..., ::-1])  # preprocess uses RGB
        persons = np.stack([
            person_keypoints(w // 3, h // 2, h // 8),
            person_keypoints(2 * w // 3, h // 2 + 20, h // 10),
        ])                                       # (2, 17, 2) image px
        kps.append(persons / STRIDE)             # grid coords for the loss
    return np.stack(imgs), np.stack(kps)


def displacement_targets(keypoints_grid: jnp.ndarray, r_h: int, r_w: int):
    """GT displacement fields + masks for the 16 kinematic edges.

    For edge (parent, child): the FORWARD field at cells near the parent
    must point parent->child (image px); BACKWARD near the child points
    child->parent (decode.py traversal semantics). Supervised on a disk
    around the source keypoint (same radius the offset mask uses).

    Returns (dfwd_t, dfwd_m, dbwd_t, dbwd_m): (P, 16, H, W, 2) / masks.
    """
    yy = jnp.arange(r_h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(r_w, dtype=jnp.float32)[None, :]

    def field(src, dst):
        # src, dst: (P, 2) grid coords -> target vec (image px), disk mask
        vec = (dst - src) * STRIDE                       # (P, 2)
        d2 = ((yy[None] - src[:, 0, None, None]) ** 2
              + (xx[None] - src[:, 1, None, None]) ** 2)  # (P, H, W)
        mask = (d2 <= 25.0).astype(jnp.float32)
        tgt = jnp.broadcast_to(vec[:, None, None, :],
                               (*mask.shape, 2))
        return tgt, mask

    dfwd_t, dfwd_m, dbwd_t, dbwd_m = [], [], [], []
    for e in range(NUM_EDGES):
        parent, child = int(EDGES[e, 0]), int(EDGES[e, 1])
        t, m = field(keypoints_grid[:, parent], keypoints_grid[:, child])
        dfwd_t.append(t)
        dfwd_m.append(m)
        t, m = field(keypoints_grid[:, child], keypoints_grid[:, parent])
        dbwd_t.append(t)
        dbwd_m.append(m)
    stack = lambda xs: jnp.stack(xs, axis=1)  # (P, 16, H, W[, 2])
    return stack(dfwd_t), stack(dfwd_m), stack(dbwd_t), stack(dbwd_m)


def main(steps: int = 3000, lr: float = 0.1):
    from posenet_tpu.decode import split_yx

    images, keypoints = dataset()
    cfg = ModelConfig(model_id=50, output_stride=STRIDE)

    # Start from the tfjs fixture checkpoint through OUR converter.
    import tempfile

    from tests.tfjs_fixture import write_tfjs_checkpoint

    with tempfile.TemporaryDirectory() as td:
        write_tfjs_checkpoint(td, seed=99)
        variables = tfjs2jax.load_tfjs_variables('mobilenet_v1_050', td)
        params = tfjs2jax.variables_to_pytree(variables, 50)
    params = jax.tree.map(jnp.asarray, params)

    # Healthy-signal rescale: the raw fixture init uses std=1/sqrt(prod of
    # non-output dims), which under-scales DEPTHWISE kernels by sqrt(C)
    # (their true fan-in is 9, not 9*C) and lacks the ReLU gain — signal
    # decays multiplicatively over 14 layers until trunk features are
    # per-channel constants (measured spatial std 0.0014, half the
    # channels exactly constant) and no head probe can localize anything.
    # Real trained checkpoints have healthy activations, so He-style gains
    # make the fixture MORE realistic, not less.
    rescaled = []
    for i, layer in enumerate(params['backbone']):
        layer = dict(layer)
        if 'w' in layer:
            layer['w'] = layer['w'] * np.sqrt(2.0)
        else:
            c_in = layer['dw_w'].shape[-1]        # (3, 3, 1, C)
            layer['dw_w'] = layer['dw_w'] * np.sqrt(2.0 * c_in)
            layer['pw_w'] = layer['pw_w'] * np.sqrt(2.0)
        rescaled.append(layer)
    params = {**params, 'backbone': rescaled}

    x = (jnp.asarray(images, jnp.float32) * (2.0 / 255.0) - 1.0)
    kp = jnp.asarray(keypoints, jnp.float32)          # (N, 2, 17, 2) y-x grid
    r_h, r_w = (HEIGHT - 1) // STRIDE + 1, (WIDTH - 1) // STRIDE + 1

    disp_targets = jax.vmap(
        lambda k: displacement_targets(k, r_h, r_w))(kp)

    from posenet_tpu.models import mobilenet_v1

    # The backbone is frozen (heads-only fine-tune, reference semantics),
    # so compute trunk features ONCE and train the 1x1 head convs as a
    # linear probe — each step touches only the head parameters.
    feat = jax.jit(
        lambda p, xx: mobilenet_v1.backbone_features(p, xx, cfg))(params, x)
    feat = jax.lax.stop_gradient(feat)

    heads_p = params['heads']
    tx = optax.adam(lr)
    opt_state = tx.init(heads_p)

    def loss_fn(hp):
        out = mobilenet_v1.run_heads(hp, feat)
        base = loss_lib.batched_loss(out['heatmap_logits'], out['offset'],
                                     kp, STRIDE)
        # displacement supervision (fields packed [y||x] like the decoder)
        d_loss = 0.0
        for name, tgt, msk in (
                ('displacement_fwd', disp_targets[0], disp_targets[1]),
                ('displacement_bwd', disp_targets[2], disp_targets[3])):
            pred = split_yx(out[name], NUM_EDGES)       # (N, H, W, 16, 2)
            pred = jnp.transpose(pred, (0, 3, 1, 2, 4))  # (N, 16, H, W, 2)
            m = msk[..., None]
            d_loss = d_loss + jnp.mean(
                loss_lib.smooth_l1(pred[:, None] * m, tgt * m))
        return base['loss'] + d_loss, base

    @jax.jit
    def step(hp, o):
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(hp)
        updates, o = tx.update(g, o, hp)
        return optax.apply_updates(hp, updates), o, l, aux

    for i in range(steps):
        heads_p, opt_state, l, aux = step(heads_p, opt_state)
        if i % 50 == 0 or i == steps - 1:
            print(f"step {i}: loss {float(l):.4f} "
                  f"hm {float(aux['heatmap_loss']):.4f} "
                  f"off {float(aux['offset_loss']):.4f}", flush=True)

    params = {**params, 'heads': jax.device_get(heads_p)}
    params = jax.tree.map(np.asarray, params)

    os.makedirs(os.path.dirname(FIXTURE_PATH), exist_ok=True)
    tfjs2jax.save_params_npz(FIXTURE_PATH, params)
    print(f"wrote {FIXTURE_PATH}")

    # quick self-check: decode one image, expect >=2 confident poses
    from posenet_tpu.config import DecodeConfig
    from posenet_tpu.decode import decode_batch

    out = mobilenet_v1.forward(jax.tree.map(jnp.asarray, params), x[:1], cfg)
    hm = np.asarray(out['heatmap'])
    print(f"heatmap: max {hm.max():.3f} p99 {np.percentile(hm, 99):.3f} "
          f"mean {hm.mean():.3f}")
    off = np.asarray(out['offset'])
    print(f"offset pred range [{off.min():.1f}, {off.max():.1f}]")
    dec = decode_batch(out['heatmap'], out['offset'],
                       out['displacement_fwd'], out['displacement_bwd'],
                       STRIDE, DecodeConfig(min_pose_score=0.15,
                                            score_threshold=0.25))
    print("pose scores:", np.asarray(dec.pose_scores)[0][:5])


if __name__ == '__main__':
    main()
