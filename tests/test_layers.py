"""Parity tests: lav_tpu.nn.layers vs torch CPU ops.

These pin the exact conv/convtranspose/batchnorm/GRU semantics that the
torch->jax weight converter depends on.
"""

import numpy as np
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

from lav_tpu.nn import layers as L


def _j(x):
    return jnp.asarray(x)


def test_conv2d_matches_torch(rng):
    tconv = nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
    x = rng.normal(size=(2, 3, 9, 11)).astype(np.float32)
    ref = tconv(torch.tensor(x)).detach().numpy()

    p = {"w": _j(tconv.weight.detach().numpy().transpose(2, 3, 1, 0))}
    ours = np.asarray(
        L.conv2d(p, _j(x.transpose(0, 2, 3, 1)), stride=2, padding=1)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_conv2d_dilated_asym_matches_torch(rng):
    # ERFNet's (3,1)/(1,3) factorized dilated convs
    tconv = nn.Conv2d(4, 4, (3, 1), stride=1, padding=(2, 0), dilation=(2, 1))
    x = rng.normal(size=(1, 4, 12, 10)).astype(np.float32)
    ref = tconv(torch.tensor(x)).detach().numpy()
    p = {
        "w": _j(tconv.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "b": _j(tconv.bias.detach().numpy()),
    }
    ours = np.asarray(
        L.conv2d(p, _j(x.transpose(0, 2, 3, 1)), padding=(2, 0), dilation=(2, 1))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_conv_transpose2d_matches_torch(rng):
    for (k, s, pad, op) in [(3, 2, 1, 1), (4, 2, 1, 0), (4, 4, 1, 2), (1, 1, 0, 0), (2, 2, 0, 0)]:
        tconv = nn.ConvTranspose2d(5, 7, k, stride=s, padding=pad, output_padding=op)
        x = rng.normal(size=(2, 5, 8, 8)).astype(np.float32)
        ref = tconv(torch.tensor(x)).detach().numpy()
        # torch convtranspose weight: (cin, cout, kh, kw) -> HW I O
        p = {
            "w": _j(tconv.weight.detach().numpy().transpose(2, 3, 0, 1)),
            "b": _j(tconv.bias.detach().numpy()),
        }
        ours = np.asarray(
            L.conv_transpose2d(
                p, _j(x.transpose(0, 2, 3, 1)), stride=s, padding=pad, output_padding=op
            )
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, ref, atol=1e-4, err_msg=f"k{k}s{s}p{pad}op{op}")


def test_batchnorm_train_and_eval_match_torch(rng):
    tbn = nn.BatchNorm2d(6, eps=1e-3, momentum=0.01)
    tbn.weight.data.normal_()
    tbn.bias.data.normal_()
    x = rng.normal(size=(4, 6, 5, 5)).astype(np.float32)

    p = L.batchnorm_init(6)
    p["scale"] = _j(tbn.weight.detach().numpy())
    p["bias"] = _j(tbn.bias.detach().numpy())

    # train step
    tbn.train()
    ref = tbn(torch.tensor(x)).detach().numpy()
    ours, stats = L.batchnorm(
        p, _j(x.transpose(0, 2, 3, 1)), train=True, eps=1e-3, momentum=0.01
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(stats["mean"]), tbn.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats["var"]), tbn.running_var.numpy(), atol=1e-5
    )

    # eval step with the updated stats
    p2 = L.bn_update(p, stats)
    tbn.eval()
    x2 = rng.normal(size=(2, 6, 5, 5)).astype(np.float32)
    ref2 = tbn(torch.tensor(x2)).detach().numpy()
    ours2, _ = L.batchnorm(p2, _j(x2.transpose(0, 2, 3, 1)), train=False, eps=1e-3)
    np.testing.assert_allclose(
        np.asarray(ours2).transpose(0, 3, 1, 2), ref2, atol=1e-4
    )


def test_gru_matches_torch(rng):
    tgru = nn.GRU(4, 16, batch_first=True)
    x = rng.normal(size=(3, 10, 4)).astype(np.float32)
    h0 = rng.normal(size=(1, 3, 16)).astype(np.float32)
    ref, ref_h = tgru(torch.tensor(x), torch.tensor(h0))

    p = {
        "w_ih": _j(tgru.weight_ih_l0.detach().numpy().T),
        "w_hh": _j(tgru.weight_hh_l0.detach().numpy().T),
        "b_ih": _j(tgru.bias_ih_l0.detach().numpy()),
        "b_hh": _j(tgru.bias_hh_l0.detach().numpy()),
    }
    ours, ours_h = L.gru(p, _j(x), _j(h0[0]))
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_h), ref_h[0].detach().numpy(), atol=1e-4)


def test_max_pool2d_matches_torch(rng):
    x = rng.normal(size=(2, 3, 11, 11)).astype(np.float32)
    ref = torch.nn.functional.max_pool2d(
        torch.tensor(x), kernel_size=3, stride=2, padding=1
    ).numpy()
    ours = np.asarray(
        L.max_pool2d(_j(x.transpose(0, 2, 3, 1)), 3, 2, 1)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_linear_matches_torch(rng):
    tl = nn.Linear(8, 5)
    x = rng.normal(size=(4, 8)).astype(np.float32)
    ref = tl(torch.tensor(x)).detach().numpy()
    p = {"w": _j(tl.weight.detach().numpy().T), "b": _j(tl.bias.detach().numpy())}
    np.testing.assert_allclose(np.asarray(L.linear(p, _j(x))), ref, atol=1e-4)


def test_conv1_space_to_depth_matches_direct(rng):
    """The s2d entry conv must equal the direct 7x7/s2/p3 conv exactly
    (same products, different summation order -> f32-rounding band)."""
    import jax
    import jax.numpy as jnp
    from lav_tpu.nn import layers as L
    from lav_tpu.nn.resnet import _conv1_space_to_depth

    for C in (3, 5, 9):
        w = jnp.asarray(rng.normal(size=(7, 7, C, 16)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(2, 24, 32, C)).astype(np.float32))
        ref = L.conv2d({"w": w}, x, stride=2, padding=3)
        out = _conv1_space_to_depth(w, x)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=2e-4)
