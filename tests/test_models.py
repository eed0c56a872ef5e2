"""Shape/dtype/semantics tests for the Flax model zoo (SURVEY.md §4.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skyhdr.config import ModelConfig
from skyhdr.models import (
    Discriminator,
    Generator,
    SunPoseNet,
    SunRadNet,
    perceptual_l1,
    random_vgg16_weights,
    sunpose_with_cams,
    vgg16_features,
)

CFG = ModelConfig(im_height=32, im_width=128)
SMALL = ModelConfig(im_height=8, im_width=32)
B = 2


def _ldr(cfg, b=B, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, size=(b, cfg.im_height, cfg.im_width, 3)).astype(np.float32))


def test_generator_submethod_shapes():
    cfg = SMALL
    gen = Generator(cfg)
    x = _ldr(cfg)
    variables = gen.init(jax.random.PRNGKey(0), x)

    res = gen.apply(variables, x, method=Generator.encode)
    assert res.shape == (B, cfg.im_height // 4, cfg.im_width // 4, 128)

    sky = gen.apply(variables, res, x, method=Generator.sky_decode)
    assert sky.shape == x.shape
    assert float(jnp.min(sky)) >= 0.0  # final relu (generator.py:124)

    h, w = cfg.im_height, cfg.im_width
    cam1 = jnp.ones((B, h, w, 1)) * 0.5
    cam2 = jnp.ones((B, h // 2, w // 2, 1)) * 0.5
    cam3 = jnp.ones((B, h // 4, w // 4, 1)) * 0.5
    pose = jnp.full((B, h, w, 1), 1.0 / (h * w))
    sun_rad, gamma, beta = gen.apply(
        variables, x, cam1, cam2, cam3, pose, False,
        method=Generator.sun_rad_estimation,
    )
    assert sun_rad.shape == (B, h, w, 3)
    assert gamma.shape == (B, 1, 1, 1) and beta.shape == (B, 1, 1, 1)
    assert 0.0 < float(gamma.min()) < 1.0 and 0.0 < float(beta.min()) < 1.0

    sun = gen.apply(variables, res, sun_rad, method=Generator.sun_decode)
    assert sun.shape == x.shape
    blended = gen.apply(variables, sky, sun, method=Generator.blending)
    np.testing.assert_allclose(np.asarray(blended), np.asarray(sky + sun), rtol=1e-6)


def test_sunrad_dirac_delta_math():
    """Golden check of the Dirac-delta head (reference sunrad_net.py:62-69):
    radiance = clip(gamma * exp(-(1-x)^2/beta) / (beta*sqrt(pi)), 30000)."""
    net = SunRadNet()
    x = jnp.full((1, 8, 32, 1), 0.25)
    feats = jnp.zeros((1, 8, 32, 6))
    variables = net.init(jax.random.PRNGKey(0), x, feats)
    rad, gamma, beta = net.apply(variables, x, feats, train=False)
    g, b = float(gamma[0, 0, 0, 0]), float(beta[0, 0, 0, 0])
    expected = g * np.exp(-((1 - 0.25) ** 2) / (b + 1e-5)) / (b * np.sqrt(np.pi) + 1e-5)
    expected = min(expected, 30000.0)
    np.testing.assert_allclose(float(rad[0, 4, 4, 0]), expected, rtol=1e-4)


def test_sunpose_net_outputs():
    cfg = SMALL
    net = SunPoseNet(cfg)
    x = _ldr(cfg)
    variables = net.init(jax.random.PRNGKey(0), x)
    sm, acts = net.apply(variables, x)
    assert sm.shape == (B, cfg.num_bins)
    np.testing.assert_allclose(np.asarray(sm.sum(-1)), 1.0, rtol=1e-5)
    shapes = net.activation_shapes(B)
    for a, s in zip(acts, shapes):
        assert a.shape == s
    # Perturbation hook: eps of zeros changes nothing.
    eps = tuple(jnp.zeros(s) for s in shapes)
    sm2, _ = net.apply(variables, x, eps)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(sm2), atol=1e-6)


def test_gradcam_values_and_stopgrad():
    cfg = SMALL
    net = SunPoseNet(cfg)
    x = _ldr(cfg)
    variables = net.init(jax.random.PRNGKey(0), x)
    gt = jnp.zeros((B, cfg.num_bins)).at[:, 5].set(1.0)

    apply_fn = lambda v, xx, eps: net.apply(v, xx, eps)
    sm, cams = sunpose_with_cams(apply_fn, variables, x, gt)
    assert sm.shape == (B, cfg.num_bins)
    assert cams[0].shape == (B, cfg.im_height, cfg.im_width, 1)
    assert cams[1].shape == (B, cfg.im_height // 2, cfg.im_width // 2, 1)
    assert cams[2].shape == (B, cfg.im_height // 4, cfg.im_width // 4, 1)
    for cam in cams:
        assert float(cam.min()) >= 0.0  # relu'd (grad_cam.py:39)
    # Inference mode: y_c = max prob (train_sun.py:210).
    sm3, cams3 = sunpose_with_cams(apply_fn, variables, x, None)
    assert cams3[0].shape == cams[0].shape

    # CAMs are stop-gradiented: d(sum cams)/d(params) == 0, while
    # d(sum sm)/d(params) != 0.
    def cam_loss(v):
        _, c = sunpose_with_cams(apply_fn, v, x, gt)
        return sum(jnp.sum(ci) for ci in c)

    def sm_loss(v):
        s, _ = sunpose_with_cams(apply_fn, v, x, gt)
        return jnp.sum(s * gt)

    gc = jax.grad(cam_loss)(variables)
    flat = jax.tree_util.tree_leaves(gc)
    assert all(float(jnp.abs(g).max()) == 0.0 for g in flat)
    gs = jax.tree_util.tree_leaves(jax.grad(sm_loss)(variables))
    assert any(float(jnp.abs(g).max()) > 0.0 for g in gs)


def test_gradcam_matches_direct_gradient():
    """The zero-perturbation trick must equal a direct d(y_c)/d(a1) gradient
    computed by differentiating through a functional split of the net."""
    cfg = SMALL
    net = SunPoseNet(cfg)
    x = _ldr(cfg, b=1)
    variables = net.init(jax.random.PRNGKey(1), x)
    gt = jnp.zeros((1, cfg.num_bins)).at[:, 17].set(1.0)

    apply_fn = lambda v, xx, eps: net.apply(v, xx, eps)
    _, cams = sunpose_with_cams(apply_fn, variables, x, gt)

    # Direct: grad wrt eps[0] only, via jax.grad on a scalar.
    shapes = net.activation_shapes(1)

    def f(e1):
        eps = (e1, jnp.zeros(shapes[1]), jnp.zeros(shapes[2]))
        sm, _ = net.apply(variables, x, eps)
        return sm[0, 17]

    g1 = jax.grad(f)(jnp.zeros(shapes[0]))
    _, acts = net.apply(variables, x)
    w = jnp.mean(g1, axis=(1, 2))
    cam_direct = jax.nn.relu(jnp.einsum("bc,bhwc->bhw", w, acts[0]))[..., None]
    np.testing.assert_allclose(np.asarray(cams[0]), np.asarray(cam_direct),
                               rtol=1e-4, atol=1e-6)


def test_discriminator_patch_logits():
    disc = Discriminator()
    cfg = CFG
    ldr = _ldr(cfg)
    hdr = _ldr(cfg, seed=1)
    variables = disc.init(jax.random.PRNGKey(0), ldr, hdr, train=False)
    out, mutated = disc.apply(
        variables, ldr, hdr, train=True, mutable=["batch_stats"]
    )
    # 32x128 -> 16x64 -> 8x32 -> 4x16 -> 4x16 -> VALID 4x4 conv -> 1x13.
    assert out.shape == (B, 1, 13, 1)
    assert "batch_stats" in mutated
    # Eval path uses running stats, no mutation needed.
    out_eval = disc.apply(variables, ldr, hdr, train=False)
    assert out_eval.shape == (B, 1, 13, 1)


def test_vgg16_features_and_perceptual():
    weights = random_vgg16_weights()
    x = _ldr(CFG)
    p1, p2, p3 = vgg16_features(weights, x)
    assert p1.shape == (B, 16, 64, 64)
    assert p2.shape == (B, 8, 32, 128)
    assert p3.shape == (B, 4, 16, 256)
    assert float(perceptual_l1(weights, x, x)) == 0.0
    assert float(perceptual_l1(weights, x, x * 0.5 + 0.1)) > 0.0


def test_vgg16_bf16_close_to_f32():
    """The bf16 backbone (compute_dtype follow, engine.py) must agree with
    f32 on the loss value and on the gradient direction — it only feeds an
    L1 loss, so ~2^-8 relative feature error is the expected band."""
    weights = random_vgg16_weights()
    pred = _ldr(CFG, seed=2)
    target = _ldr(CFG, seed=3)

    f32 = float(perceptual_l1(weights, pred, target))
    bf16 = float(perceptual_l1(weights, pred, target, dtype=jnp.bfloat16))
    assert bf16 == pytest.approx(f32, rel=0.02)
    assert jnp.asarray(
        perceptual_l1(weights, pred, target, dtype=jnp.bfloat16)
    ).dtype == jnp.float32  # loss accumulates f32

    g32 = jax.grad(lambda p: perceptual_l1(weights, p, target))(pred)
    g16 = jax.grad(
        lambda p: perceptual_l1(weights, p, target, dtype=jnp.bfloat16)
    )(pred)
    assert g16.dtype == g32.dtype == pred.dtype
    cos = float(jnp.vdot(g32, g16)
                / (jnp.linalg.norm(g32.ravel()) * jnp.linalg.norm(g16.ravel())))
    # 0.983 measured with the He stand-in weights (noisier features than a
    # trained VGG); the bound guards against a broken cast path, not noise.
    assert cos > 0.97
    assert bool(jnp.isfinite(g16).all())


def test_vgg16_npy_loader(tmp_path):
    """Round-trip the SingleHDR npy dict format (reference vgg16.py:99)."""
    from skyhdr.models.vgg16 import load_vgg16_npy, _LAYERS

    rng = np.random.default_rng(0)
    data = {
        name: [rng.normal(size=(3, 3, cin, cout)).astype(np.float32),
               rng.normal(size=(cout,)).astype(np.float32)]
        for name, cin, cout in _LAYERS
    }
    path = tmp_path / "vgg16.npy"
    np.save(path, data, allow_pickle=True)
    loaded = load_vgg16_npy(str(path))
    # conv1_1 input channels flipped BGR->RGB; everything else verbatim.
    np.testing.assert_array_equal(loaded["conv1_1"][0], data["conv1_1"][0][:, :, ::-1, :])
    np.testing.assert_array_equal(loaded["conv2_2"][0], data["conv2_2"][0])
    np.testing.assert_array_equal(loaded["conv3_3"][1], data["conv3_3"][1])


def test_generator_full_forward_jit():
    cfg = SMALL
    gen = Generator(cfg)
    x = _ldr(cfg)
    variables = gen.init(jax.random.PRNGKey(0), x)
    y = jax.jit(lambda v, xx: gen.apply(v, xx))(variables, x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))


def test_generator_da_conv_variant():
    cfg = ModelConfig(im_height=8, im_width=32, use_da_conv=True)
    gen = Generator(cfg)
    x = _ldr(cfg)
    variables = gen.init(jax.random.PRNGKey(0), x)
    y = gen.apply(variables, x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))
