"""Reverse-converter (JAX -> HF reference layout) and push_to_hub tests.

The reference inherits ``save_pretrained``/``push_to_hub`` from
``PreTrainedModel`` (/root/reference/README.md:33); our checkpoints must
round-trip back into the reference's ``flamingo.*`` state-dict naming
(modeling_flamingo.py:376 vision-excluded convention).
"""
import numpy as np
import pytest
import torch

import jax

from flamingo_mini_tpu.configuration_flamingo import FlamingoConfig
from flamingo_mini_tpu.utils.hf_export import export_flamingo
from flamingo_mini_tpu.utils.hf_weights import (convert_flamingo,
                                                state_dict_to_numpy)

from test_parity_flamingo import TINY_LM, TINY_VIT, ref_model, tiny_config  # noqa: F401


def test_export_inverts_reference_state_dict(ref_model):  # noqa: F811
    """reference state_dict -> convert_flamingo -> export_flamingo returns
    the exact same arrays under the exact same keys (vision + tied head
    excluded, per the reference checkpoint convention)."""
    sd = state_dict_to_numpy(ref_model.state_dict())
    n_layers = TINY_LM["n_layer"]
    params = convert_flamingo(sd, xattn_every=2, n_lm_layers=n_layers)
    out = export_flamingo(params, xattn_every=2)

    want = {k: v for k, v in sd.items()
            if not k.startswith("flamingo.vision_encoder.")
            and k != "flamingo.lm_head.weight"
            and not k.endswith(".attn.bias")          # GPT-2 causal-mask
            and not k.endswith(".attn.masked_bias")}  # buffers, not weights
    got = {k: v for k, v in out.items() if k != "flamingo.lm_head.weight"}
    assert set(got) == set(want), (
        f"missing={sorted(set(want) - set(got))[:5]} "
        f"extra={sorted(set(got) - set(want))[:5]}")
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    # tied head mirrors the (resized) token embedding
    np.testing.assert_array_equal(out["flamingo.lm_head.weight"],
                                  sd["flamingo.lm.wte.weight"])


def test_exported_checkpoint_loads_into_reference(ref_model):  # noqa: F811
    """load_state_dict on the actual torch reference accepts our export with
    no unexpected keys (missing = vision + buffers only)."""
    sd = state_dict_to_numpy(ref_model.state_dict())
    params = convert_flamingo(sd, xattn_every=2,
                              n_lm_layers=TINY_LM["n_layer"])
    out = export_flamingo(params, xattn_every=2)
    res = ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in out.items()},
        strict=False)
    assert not res.unexpected_keys, res.unexpected_keys
    for k in res.missing_keys:
        assert (k.startswith("flamingo.vision_encoder.")
                or k.endswith((".attn.bias", ".attn.masked_bias"))), k


def test_export_quantized_params_raises_clearly(tmp_path):
    """save_pretrained(save_format='hf') on an int8-quantized model must
    raise a clear error, not an opaque KeyError (advisor r2 finding)."""
    from flamingo_mini_tpu.modeling_flamingo import FlamingoModel
    model = FlamingoModel(tiny_config(), rng=jax.random.PRNGKey(0))
    model.quantize_int8()
    with pytest.raises(ValueError, match="unquantized"):
        model.save_pretrained(str(tmp_path), save_format="hf")


def test_push_to_hub_stages_local_cache(tmp_path, monkeypatch):
    """push_to_hub (zero-egress) stages into $HF_HOME/hub so
    from_pretrained(repo_id) round-trips."""
    from flamingo_mini_tpu.modeling_flamingo import FlamingoModel
    monkeypatch.setenv("HF_HOME", str(tmp_path))

    config = tiny_config()
    model = FlamingoModel(config,
                          rng=jax.random.PRNGKey(0))
    snap = model.push_to_hub("someone/tiny-flamingo", save_format="npz")
    assert str(tmp_path) in snap

    loaded = FlamingoModel.from_pretrained("someone/tiny-flamingo")
    flat_a = jax.tree_util.tree_leaves(model.params)
    flat_b = jax.tree_util.tree_leaves(loaded.params)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_pretrained_hf_format_roundtrip(tmp_path):
    """save_format='hf' writes a reference-layout checkpoint our own
    from_pretrained reads back (exercising the torch/safetensors loader)."""
    from flamingo_mini_tpu.modeling_flamingo import FlamingoModel
    config = tiny_config()
    model = FlamingoModel(config, rng=jax.random.PRNGKey(1))
    model.save_pretrained(str(tmp_path / "ckpt"), save_format="hf")

    loaded = FlamingoModel.from_pretrained(
        str(tmp_path / "ckpt"), rng=jax.random.PRNGKey(2))
    for part in ("resampler", "lm", "xattn"):
        a = jax.tree_util.tree_leaves(model.params[part])
        b = jax.tree_util.tree_leaves(loaded.params[part])
        assert len(a) == len(b), part
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x, np.float32),
                                       np.asarray(y, np.float32),
                                       rtol=0, atol=1e-6)
