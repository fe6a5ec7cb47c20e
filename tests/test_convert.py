"""Checkpoint conversion tests: a synthetic torch-style IRR_PWC state_dict
(reference module naming, NCHW weight layouts) must map 1:1 onto our param
tree, and the converted model must compute the same conv outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as tf

from irr_tpu import models
from irr_tpu.convert import (convert_state_dict, load_into_params,
                             torch_conv_to_hwio, torch_deconv_to_hwio)
from irr_tpu.nn.core import param_paths


def _torch_key_for(path):
    """Inverse mapping: our param path -> reference torch state_dict key."""
    parts = path.split("/")
    leaf = {"w": "weight", "b": "bias"}[parts[-1]]
    body = parts[:-1]
    if body[0] == "feature_pyramid_extractor":
        return f"feature_pyramid_extractor.convs.{body[1]}.{body[2]}.0.{leaf}"
    if body[0] in ("flow_estimators", "occ_estimators"):
        return f"{body[0]}.{body[1]}.0.{leaf}"
    if body[0] in ("context_networks", "occ_context_networks"):
        return f"{body[0]}.convs.{body[1]}.0.{leaf}"
    if body[0] == "occ_shuffle_upsample":
        if body[1] == "res_convs":
            return f"occ_shuffle_upsample.res_convs.{body[2]}.0.{leaf}"
        return f"occ_shuffle_upsample.{body[1]}.0.{leaf}"
    if body[0] in ("refine_flow", "refine_occ"):
        return f"{body[0]}.convs.{body[1]}.0.{leaf}"
    if body[0] == "conv_1x1":
        return f"conv_1x1.{body[1]}.0.{leaf}"
    if body[0] == "conv_1x1_1":
        return f"conv_1x1_1.0.{leaf}"
    raise KeyError(path)


def test_irr_pwc_full_state_dict_roundtrip():
    model = models.IRR_PWC()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)

    # synthesize a torch state_dict covering EVERY param of the model
    sd = {}
    expected = {}
    for path, leaf in param_paths(params).items():
        key = "_model." + _torch_key_for(path)
        arr = rng.randn(*leaf.shape).astype(np.float32)
        expected[path] = arr
        if path.endswith("/w"):
            # store in torch layout (Cout, Cin, KH, KW)
            sd[key] = np.transpose(arr, (3, 2, 0, 1))
        else:
            sd[key] = arr

    new_params, stats = load_into_params(sd, params)
    assert stats["placed"] == len(expected), (stats["missing"][:5],
                                              stats["shape_mismatch"][:3])
    assert not stats["missing"]
    assert not stats["shape_mismatch"]
    for path, leaf in param_paths(new_params).items():
        np.testing.assert_allclose(np.asarray(leaf), expected[path], atol=0)


def test_conv_weight_transform_matches_torch_conv():
    """A converted Conv2d weight must reproduce torch's conv output."""
    from irr_tpu.nn.core import Conv
    rng = np.random.RandomState(1)
    w_t = rng.randn(8, 5, 3, 3).astype(np.float32)  # (Cout, Cin, KH, KW)
    b_t = rng.randn(8).astype(np.float32)
    x = rng.randn(2, 9, 11, 5).astype(np.float32)

    want = tf.conv2d(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                     torch.from_numpy(w_t), torch.from_numpy(b_t), padding=1)
    want = np.transpose(want.numpy(), (0, 2, 3, 1))

    conv = Conv(5, 8, relu=False)
    p = {"w": jnp.asarray(torch_conv_to_hwio(w_t)), "b": jnp.asarray(b_t)}
    got = np.asarray(conv(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_deconv_weight_transform_matches_torch():
    from irr_tpu.nn.core import ConvTranspose
    rng = np.random.RandomState(2)
    w_t = rng.randn(6, 4, 4, 4).astype(np.float32)  # (Cin, Cout, KH, KW)
    x = rng.randn(2, 7, 9, 6).astype(np.float32)

    want = tf.conv_transpose2d(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                               torch.from_numpy(w_t), stride=2, padding=1)
    want = np.transpose(want.numpy(), (0, 2, 3, 1))

    deconv = ConvTranspose(6, 4, kernel_size=4, stride=2, pad=1,
                           relu=False, bias=False)
    p = {"w": jnp.asarray(torch_deconv_to_hwio(w_t))}
    got = np.asarray(deconv(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_convert_cli_end_to_end(tmp_path):
    """`python -m irr_tpu.convert ref.ckpt out.ckpt` on a checkpoint in the
    reference's on-disk format (torch.save of {**stats, "state_dict": ...},
    configuration.py:281-300): the written npz restores 1:1 through
    CheckpointSaver, ready for `main.py --checkpoint=<out.ckpt>`."""
    from irr_tpu import convert as convert_mod
    from irr_tpu.runtime.checkpoint import CheckpointSaver

    model = models.IRR_PWC()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    rng = np.random.RandomState(7)

    sd, expected = {}, {}
    for path, leaf in param_paths(params).items():
        key = "_model." + _torch_key_for(path)
        arr = rng.randn(*leaf.shape).astype(np.float32)
        expected[path] = arr
        t = np.transpose(arr, (3, 2, 0, 1)) if path.endswith("/w") else arr
        sd[key] = torch.from_numpy(t)

    src = str(tmp_path / "checkpoint_best.ckpt")
    torch.save({"epoch": 108, "epe": 1.5, "state_dict": sd}, src)

    dst = str(tmp_path / "converted.ckpt")
    convert_mod.main([src, dst, "--model", "IRR_PWC"])

    restored = CheckpointSaver().restore(dst, params)
    for path, leaf in param_paths(restored).items():
        np.testing.assert_array_equal(np.asarray(leaf), expected[path])


def test_convert_cli_rejects_wrong_model(tmp_path):
    """A state_dict whose keys map onto nothing in --model must fail loudly
    (placed == 0), not write an untouched random-init checkpoint."""
    from irr_tpu import convert as convert_mod
    import pytest as _pytest

    src = str(tmp_path / "bogus.ckpt")
    torch.save({"state_dict": {
        "_model.not_a_module.0.weight": torch.zeros(4, 4, 3, 3)}}, src)
    with _pytest.raises(SystemExit):
        convert_mod.main([src, str(tmp_path / "out.ckpt"),
                          "--model", "IRR_PWC"])
