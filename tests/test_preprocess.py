"""Preprocessing + drawing + native library tests."""

import numpy as np
import pytest

from posenet_tpu.preprocess import (preprocess_on_device, process_input,
                                    read_imgfile, valid_resolution)

from tests import reference_oracle


def test_valid_resolution():
    # (d // s) * s + 1 rule (reference utils.py:7-10)
    assert valid_resolution(1280, 720, 16) == (1281, 721)
    assert valid_resolution(513, 513, 16) == (513, 513)
    assert valid_resolution(500, 500, 16) == (497, 497)
    assert valid_resolution(640, 480, 8) == (641, 481)


def test_process_input_contract():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (720, 1280, 3), dtype=np.uint8)
    inp, src, scale = process_input(img, scale_factor=1.0, output_stride=16)
    assert inp.shape == (1, 3, 721, 1281)
    assert inp.dtype == np.float32
    assert inp.min() >= -1.0 and inp.max() <= 1.0
    assert src is img
    np.testing.assert_allclose(scale, [720 / 721, 1280 / 1281])


@pytest.mark.skipif(not reference_oracle.has_reference(), reason="reference unavailable")
def test_process_input_matches_reference():
    reference_oracle._import_reference()
    from posenet import utils as ref_utils

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (480, 640, 3), dtype=np.uint8)
    ours = process_input(img.copy(), scale_factor=0.7125, output_stride=16)
    theirs = ref_utils._process_input(img.copy(), scale_factor=0.7125,
                                      output_stride=16)
    np.testing.assert_array_equal(ours[0], theirs[0])
    np.testing.assert_allclose(ours[2], theirs[2])


def test_read_imgfile(tmp_path):
    import cv2

    img = np.random.RandomState(2).randint(0, 255, (100, 160, 3), dtype=np.uint8)
    path = str(tmp_path / "x.jpg")
    cv2.imwrite(path, img)
    inp, src, scale = read_imgfile(path, 1.0, 16)
    assert inp.shape == (1, 3, 97, 161)
    with pytest.raises(IOError):
        read_imgfile(str(tmp_path / "missing.jpg"))


def test_preprocess_on_device():
    rng = np.random.RandomState(3)
    frame = rng.randint(0, 255, (100, 160, 3), dtype=np.uint8)
    out = np.asarray(preprocess_on_device(frame, (65, 65)))
    assert out.shape == (1, 65, 65, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    # BGR->RGB flip: device output channel 0 comes from input channel 2
    same_size = np.asarray(preprocess_on_device(frame, (100, 160)))[0]
    expect = frame[..., ::-1].astype(np.float32) * (2 / 255) - 1
    np.testing.assert_allclose(same_size, expect, atol=1e-5)


def test_native_preprocess_matches_cv2():
    import cv2

    from posenet_tpu import native_preprocess as npp

    if not npp.native_available():
        pytest.skip("native library not built (make -C native)")
    rng = np.random.RandomState(4)
    img = rng.randint(0, 255, (240, 320, 3), dtype=np.uint8)
    ours = npp.resize_bilinear(img, (97, 161))
    ref = cv2.resize(img, (161, 97), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1

    batch = npp.resize_batch([img, img[:120, :160]], (65, 65))
    assert batch.shape == (2, 65, 65, 3)
    single = npp.resize_bilinear(img, (65, 65), swap_rb=True)
    np.testing.assert_array_equal(batch[0], single)

    norm = npp.resize_normalize(img, (65, 65))
    np.testing.assert_allclose(
        norm, single.astype(np.float32) * (2 / 255) - 1, atol=1e-6)


def test_resize_rgb_backend_policy():
    """resize_rgb is THE serving/video host hot-path op: 'auto' must pick
    the measured-fastest cv2 path (resize + cvtColor — the ::-1 numpy copy
    it replaced cost 3x, PERF.md), backends must agree to +-1 LSB, and
    explicit backends must fail loudly when unavailable."""
    import cv2

    from posenet_tpu import native_preprocess as npp

    rng = np.random.RandomState(7)
    bgr = rng.randint(0, 255, (240, 320, 3), dtype=np.uint8)
    auto = npp.resize_rgb(bgr, (97, 161))
    ref = cv2.cvtColor(cv2.resize(bgr, (161, 97),
                                  interpolation=cv2.INTER_LINEAR),
                       cv2.COLOR_BGR2RGB)
    np.testing.assert_array_equal(auto, ref)        # auto == cv2 path here
    np.testing.assert_array_equal(npp.resize_rgb(bgr, (97, 161), 'cv2'), ref)

    if npp.native_available():
        nat = npp.resize_rgb(bgr, (97, 161), 'native')
        assert np.abs(nat.astype(int) - ref.astype(int)).max() <= 1

    with pytest.raises(ValueError, match='backend'):
        npp.resize_rgb(bgr, (97, 161), 'mystery')


def test_draw_functions():
    from posenet_tpu.draw import (draw_keypoints, draw_skel_and_kp,
                                  draw_skeleton, get_adjacent_keypoints)

    img = np.zeros((100, 100, 3), np.uint8)
    pose_scores = np.array([0.9, 0.0])
    kp_scores = np.full((2, 17), 0.8)
    kp_coords = np.random.RandomState(5).uniform(10, 90, (2, 17, 2))

    adj = get_adjacent_keypoints(kp_scores[0], kp_coords[0], 0.5)
    assert len(adj) == 12  # all 12 skeleton edges above confidence

    out = draw_skel_and_kp(img.copy(), pose_scores, kp_scores, kp_coords,
                           0.5, 0.5)
    assert out.shape == img.shape
    assert out.sum() > 0   # something was drawn

    out2 = draw_keypoints(img.copy(), pose_scores, kp_scores, kp_coords, 0.5, 0.5)
    out3 = draw_skeleton(img.copy(), pose_scores, kp_scores, kp_coords, 0.5, 0.5)
    assert out2.sum() > 0 and out3.sum() > 0


def test_pipeline_end_to_end():
    import jax

    from posenet_tpu.config import DecodeConfig
    from posenet_tpu.models import load_model
    from posenet_tpu.pipeline import PoseNetPipeline

    model = load_model(50, output_stride=16, allow_random_init=True)
    pipe = PoseNetPipeline(model, DecodeConfig(min_pose_score=0.0,
                                               score_threshold=0.3,
                                               max_candidates=64))
    frames = np.random.RandomState(6).randint(
        0, 255, (2, 65, 65, 3), dtype=np.uint8)
    out = pipe(frames)
    assert out.pose_scores.shape == (2, 10)
    assert out.keypoint_coords.shape == (2, 10, 17, 2)
    # coordinates within the 65x65 image bounds (+offset slack)
    coords = np.asarray(out.keypoint_coords)
    assert np.isfinite(coords).all()


def test_pipeline_device_preprocess():
    """device_resize_to: the fused raw-frame program (BGR->RGB + resize +
    normalize on device) must match preprocess_on_device -> forward ->
    decode_batch chained by hand, and reject spatial partition."""
    import jax.numpy as jnp
    import pytest

    from posenet_tpu.config import DecodeConfig
    from posenet_tpu.decode import decode_batch
    from posenet_tpu.models import load_model, mobilenet_v1
    from posenet_tpu.parallel.mesh import make_mesh
    from posenet_tpu.pipeline import PoseNetPipeline
    from posenet_tpu.preprocess import preprocess_on_device

    model = load_model(50, output_stride=16, allow_random_init=True)
    dcfg = DecodeConfig(min_pose_score=0.0, score_threshold=0.3,
                        max_candidates=32)
    # source 80x100 BGR frames, processed at stride-valid 65x65 on device
    frames = np.random.RandomState(11).randint(
        0, 255, (2, 80, 100, 3), dtype=np.uint8)
    pipe = PoseNetPipeline(model, dcfg, device_resize_to=(65, 65))
    fused = pipe(frames)

    x = preprocess_on_device(jnp.asarray(frames), (65, 65))
    heads = mobilenet_v1.forward_jit(pipe.params, x, model.cfg)
    manual = decode_batch(heads['heatmap'], heads['offset'],
                          heads['displacement_fwd'],
                          heads['displacement_bwd'], 16, dcfg)
    np.testing.assert_array_equal(np.asarray(fused.pose_scores),
                                  np.asarray(manual.pose_scores))
    np.testing.assert_array_equal(np.asarray(fused.keypoint_coords),
                                  np.asarray(manual.keypoint_coords))

    # batch-sharded raw path equals unsharded
    mesh = make_mesh(8)
    frames8 = np.random.RandomState(12).randint(
        0, 255, (8, 80, 100, 3), dtype=np.uint8)
    sharded = PoseNetPipeline(model, dcfg, mesh=mesh,
                              device_resize_to=(65, 65))(frames8)
    plain = PoseNetPipeline(model, dcfg, device_resize_to=(65, 65))(frames8)
    np.testing.assert_allclose(np.asarray(sharded.keypoint_coords),
                               np.asarray(plain.keypoint_coords), atol=1e-4)

    with pytest.raises(NotImplementedError, match='spatial'):
        PoseNetPipeline(model, dcfg, mesh=mesh, partition='spatial',
                        device_resize_to=(65, 65))


def test_pipeline_with_mesh():
    import jax

    from posenet_tpu.config import DecodeConfig
    from posenet_tpu.models import load_model
    from posenet_tpu.parallel.mesh import make_mesh
    from posenet_tpu.pipeline import PoseNetPipeline

    mesh = make_mesh(8)
    model = load_model(50, output_stride=16, allow_random_init=True)
    dcfg = DecodeConfig(min_pose_score=0.0, score_threshold=0.3,
                        max_candidates=32)
    pipe = PoseNetPipeline(model, dcfg, mesh=mesh)
    frames = np.random.RandomState(9).randint(
        0, 255, (8, 65, 65, 3), dtype=np.uint8)
    out = pipe(frames)
    assert out.pose_scores.shape == (8, 10)
    # batch-sharded inference must equal the unsharded pipeline exactly
    plain = PoseNetPipeline(model, dcfg)(frames)
    np.testing.assert_allclose(np.asarray(out.pose_scores),
                               np.asarray(plain.pose_scores), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.keypoint_coords),
                               np.asarray(plain.keypoint_coords), atol=1e-4)


def test_pipeline_spatial_partition():
    """Spatial (height-sharded) inference over the 8-device mesh — the
    CNN analog of sequence parallelism; GSPMD inserts conv halo exchanges.
    Results must match the unsharded pipeline.

    Biases are inflated to make pad-row leakage visible: without the
    backbone's valid_h masking, zero-padded bottom input rows turn into
    relu6(bias) != 0 after layer 1 and shift bottom-of-image heads (random
    near-zero init biases would mask that bug)."""
    import jax

    from posenet_tpu.config import DecodeConfig
    from posenet_tpu.models import load_model
    from posenet_tpu.parallel.mesh import make_mesh
    from posenet_tpu.pipeline import PoseNetPipeline

    mesh = make_mesh(8)
    model = load_model(50, output_stride=16, allow_random_init=True)
    params = jax.tree.map(lambda a: a, model.params)
    for layer in params['backbone']:
        for k in layer:
            if k.endswith('b'):
                layer[k] = layer[k] + 1.0  # realistic-checkpoint-scale biases
    model = type(model)(params, model.cfg)
    dcfg = DecodeConfig(min_pose_score=0.0, score_threshold=0.3,
                        max_candidates=32)
    frames = np.random.RandomState(7).randint(
        0, 255, (1, 129, 129, 3), dtype=np.uint8)

    plain = PoseNetPipeline(model, dcfg)
    spatial = PoseNetPipeline(model, dcfg, mesh=mesh, partition='spatial')
    out_a = plain(frames)
    out_b = spatial(frames)
    np.testing.assert_allclose(np.asarray(out_a.pose_scores),
                               np.asarray(out_b.pose_scores), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_a.keypoint_coords),
                               np.asarray(out_b.keypoint_coords), atol=1e-3)


def test_initialize_distributed_single_process():
    """Single-process fallback must return 0 WITHOUT probing
    jax.process_count() first — that probe initializes the XLA backend,
    after which jax.distributed.initialize() always raises and the old
    code silently fell back to single-process even on real pods.
    Explicitly-requested multi-process setups must raise, not be
    swallowed."""
    import jax
    import pytest as _pytest

    from posenet_tpu.parallel.mesh import initialize_distributed

    _ = jax.devices()  # backend deliberately up, as in any late call site
    assert initialize_distributed() == 0
    assert initialize_distributed() == 0  # idempotent
    with _pytest.raises((ValueError, RuntimeError)):
        initialize_distributed(coordinator_address='127.0.0.1:9999',
                               num_processes=2, process_id=0)


def test_initialize_distributed_late_call_warns(capsys):
    """A too-late call (backend already initialized, no coordinator args)
    must degrade LOUDLY: on a real pod, auto-detection silently skipped
    means every host trains its own full copy. This also pins the jax
    error wording the warning keys on ('before', RuntimeError) — if a jax
    upgrade rewords it, this test fails instead of the warning silently
    disabling itself."""
    import jax
    import pytest as _pytest

    from posenet_tpu.parallel.mesh import initialize_distributed

    _ = jax.devices()  # backend up -> auto-detection can no longer run
    # Pin the upstream signal: type AND substring.
    with _pytest.raises(RuntimeError, match='before'):
        jax.distributed.initialize()
    capsys.readouterr()
    assert initialize_distributed() == 0
    assert 'WARNING' in capsys.readouterr().out


def test_initialize_distributed_already_initialized_old_jax(monkeypatch):
    """jax < 0.4.26 has no jax.distributed.is_initialized(); a repeat call
    on an already-initialized runtime surfaces as a RuntimeError from
    initialize(). The guard must honor the idempotence contract there —
    return the real process index, never re-raise and never report 0
    unconditionally — even when coordinator args are explicit."""
    import jax

    from posenet_tpu.parallel import mesh as mesh_mod

    class _OldDistributed:
        # No is_initialized attribute at all, like old jax.
        @staticmethod
        def initialize(**kwargs):
            raise RuntimeError(
                'jax.distributed.initialize should only be called once.')

    monkeypatch.setattr(mesh_mod.jax, 'distributed', _OldDistributed())
    assert mesh_mod.initialize_distributed() == jax.process_index()
    # Explicit args on an already-initialized runtime: still idempotent.
    assert mesh_mod.initialize_distributed(
        coordinator_address='127.0.0.1:9999', num_processes=2,
        process_id=0) == jax.process_index()


def test_pipeline_mesh_resolves_pallas_off():
    """SPATIAL partition under a mesh must resolve auto use_pallas to the
    XLA path: it runs one GSPMD program over H-sharded activations and
    pallas_call has no GSPMD partitioning rule. The DATA partition keeps
    auto (None): it runs per-shard under shard_map, where every device
    traces its own pallas_call on its local batch shard — multi-chip
    serving keeps the Mosaic traversal kernel. An explicit setting is
    honored unchanged."""
    from posenet_tpu.config import DecodeConfig
    from posenet_tpu.models import load_model
    from posenet_tpu.parallel.mesh import make_mesh
    from posenet_tpu.pipeline import PoseNetPipeline

    mesh = make_mesh(8)
    model = load_model(50, output_stride=16, allow_random_init=True)
    auto = DecodeConfig(min_pose_score=0.0)
    assert PoseNetPipeline(model, auto, mesh=mesh,
                           partition='spatial').decode_cfg.use_pallas is False
    assert PoseNetPipeline(model, auto,
                           mesh=mesh).decode_cfg.use_pallas is None
    assert PoseNetPipeline(model, auto).decode_cfg.use_pallas is None
    explicit = DecodeConfig(min_pose_score=0.0, use_pallas=True)
    assert PoseNetPipeline(model, explicit, mesh=mesh,
                           partition='spatial').decode_cfg.use_pallas is True


def test_pipeline_data_partition_uneven_batch():
    """A batch that does not divide over the mesh must still decode
    (shard_map needs divisibility; the pipeline zero-pads the batch up
    and slices the outputs back) and must equal the unsharded pipeline."""
    from posenet_tpu.config import DecodeConfig
    from posenet_tpu.models import load_model
    from posenet_tpu.parallel.mesh import make_mesh
    from posenet_tpu.pipeline import PoseNetPipeline

    mesh = make_mesh(8)
    model = load_model(50, output_stride=16, allow_random_init=True)
    dcfg = DecodeConfig(min_pose_score=0.0, score_threshold=0.3,
                        max_candidates=32)
    frames = np.random.RandomState(21).randint(
        0, 255, (3, 65, 65, 3), dtype=np.uint8)  # 3 % 8 != 0
    sharded = PoseNetPipeline(model, dcfg, mesh=mesh)(frames)
    plain = PoseNetPipeline(model, dcfg)(frames)
    np.testing.assert_allclose(np.asarray(sharded.pose_scores),
                               np.asarray(plain.pose_scores), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded.keypoint_coords),
                               np.asarray(plain.keypoint_coords), atol=1e-4)
