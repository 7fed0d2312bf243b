"""Gold parity tests: converted reference weights must reproduce the
reference model's logits (fp32, eval mode) through this framework.

This is the SURVEY.md §4 'parity tests' requirement: load a (live)
reference checkpoint via the converter and assert logits match the torch
graph on fixed inputs. Marked slow — the 224 fp32 CPU compile is minutes
on first run (cached afterward).
"""

import numpy as np
import pytest

from reference_shim import load_reference_mstr

mstr = load_reference_mstr()

pytestmark = pytest.mark.skipif(
    mstr is None, reason="reference model not importable in this env")


def _convert_and_compare(torch_model, cfg, x_nchw, atol, rtol=2e-3,
                         train_shape=None):
    import torch
    import jax
    import jax.numpy as jnp
    from transception_tpu.convert.torch2flax import convert_state_dict
    from transception_tpu.models.transception import MSTransception

    torch_model.eval()
    with torch.no_grad():
        want = torch_model(torch.from_numpy(x_nchw)).numpy()  # (B,9,H,W)

    model = MSTransception(cfg)
    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x_nhwc, train=False)
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    converted, report = convert_state_dict(sd, variables)
    got = np.asarray(jax.jit(lambda v, x: model.apply(v, x, train=False))(
        converted, x_nhwc))
    got_nchw = got.transpose(0, 3, 1, 2)
    diff = np.abs(got_nchw - want)
    denom = np.maximum(np.abs(want), 1.0)
    assert (diff / denom).max() < max(atol, rtol), (
        f"max abs diff {diff.max():.6f}, max rel diff {(diff / denom).max():.6f},"
        f" unused keys sample: {report['unused_torch_keys'][:10]}")
    return report


@pytest.mark.slow
def test_full_model_parity_default_config():
    """Published config: 3-stage MSViT, coord IFF, original bridge,
    br_config 2 (MSTr.py:2759-2761)."""
    import torch
    torch.manual_seed(0)
    ref = mstr.MSTransception(num_classes=9)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 224, 224)).astype(np.float32)

    from transception_tpu.core.config import TransceptionConfig
    cfg = TransceptionConfig(dtype="float32", use_pallas=False)
    report = _convert_and_compare(ref, cfg, x, atol=2e-3)
    # Dead reference params are expected to be unused; live ones are not.
    for k in report["unused_torch_keys"]:
        assert any(tag in k for tag in (
            "norm2", "norm3",          # MixFFN_skip dead norms (MSTr.py:896-898)
            "conv1_1_s",               # dead 1x1 convs (MSTr.py:1567-1570)
            "backbone.cpe",            # unused stage-1 cpe (MSTr.py:1667)
            "attn.scale_reduce",       # unused in channel attn (MSTr.py:2295)
            # torch registers the shared cpe/crpe under every MHCA layer as
            # alias keys (MSTr.py:920-921,850); the encoder-level keys are
            # the ones converted.
            "MHCA_layers.0.cpe", "MHCA_layers.1.cpe", "MHCA_layers.2.cpe",
            "MHCA_layers.3.cpe", "MHCA_layers.4.cpe", "MHCA_layers.5.cpe",
            "MHCA_layers.6.cpe", "MHCA_layers.7.cpe",
            ".crpe.",
            # decoder_3 takes no skip: its concat_linear/layer_formers are
            # constructed but never called (MSTr.py:284-289,2847).
            "decoder_3.concat_linear", "decoder_3.layer_former",
        )), f"unexpectedly unused torch param: {k}"


@pytest.mark.slow
def test_full_model_parity_bridge_none_gray_input():
    import torch
    torch.manual_seed(1)
    ref = mstr.MSTransception(num_classes=9, have_bridge="None")
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 1, 224, 224)).astype(np.float32)
    # Reference repeats gray->3ch inside forward (MSTr.py:2828-2829).
    from transception_tpu.core.config import TransceptionConfig
    cfg = TransceptionConfig(dtype="float32", use_pallas=False,
                             have_bridge="none")
    _convert_and_compare(ref, cfg, x, atol=2e-3)


@pytest.mark.slow
def test_full_model_parity_4stage_backbone():
    """Stage_3or4=4: conv stem + all-4-stage MHCA (MSTr.py:1746-1988)."""
    import torch
    torch.manual_seed(3)
    ref = mstr.MSTransception(num_classes=9, Stage_3or4=4)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 3, 224, 224)).astype(np.float32)
    from transception_tpu.core.config import TransceptionConfig
    cfg = TransceptionConfig(dtype="float32", use_pallas=False,
                             stage_3or4=4)
    _convert_and_compare(ref, cfg, x, atol=2e-3)


@pytest.mark.slow
def test_full_model_parity_para_bridge():
    """have_bridge='para' (MSTr.py:2500-2538)."""
    import torch
    torch.manual_seed(4)
    ref = mstr.MSTransception(num_classes=9, have_bridge="para")
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 3, 224, 224)).astype(np.float32)
    from transception_tpu.core.config import TransceptionConfig
    cfg = TransceptionConfig(dtype="float32", use_pallas=False,
                             have_bridge="para")
    _convert_and_compare(ref, cfg, x, atol=2e-3)


@pytest.mark.slow
def test_full_model_parity_casa_backbone():
    """Stage_3or4=0 -> MSViT_casa with CBAM-casa fusion (MSTr.py:1990-2204);
    requires concat='cbam' (the casa dispatch has no coord branch)."""
    import torch
    torch.manual_seed(6)
    ref = mstr.MSTransception(num_classes=9, Stage_3or4=0, concat="cbam")
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 3, 224, 224)).astype(np.float32)
    from transception_tpu.core.config import TransceptionConfig
    cfg = TransceptionConfig(dtype="float32", use_pallas=False,
                             stage_3or4=0, concat="cbam")
    _convert_and_compare(ref, cfg, x, atol=2e-3)


@pytest.mark.slow
def test_full_model_parity_sp_bridge():
    """have_bridge='sp' with one SpatialAwareTrans layer (MSTr.py:2668-2757).
    The reference instantiates scale_fuse_att in every layer but only
    layer 1 uses it (MSTr.py:2690-2692); unused copies stay unconverted."""
    import torch
    torch.manual_seed(5)
    ref = mstr.MSTransception(num_classes=9, have_bridge="sp", num_sp=1)
    ref.eval()
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 3, 224, 224)).astype(np.float32)
    from transception_tpu.core.config import TransceptionConfig
    cfg = TransceptionConfig(dtype="float32", use_pallas=False,
                             have_bridge="sp", num_sp=1)
    _convert_and_compare(ref, cfg, x, atol=2e-3)


@pytest.mark.slow
def test_full_model_parity_spatial_bridge_config0():
    """br_config 0: all-spatial bridge attention exercises Scale_reduce."""
    import torch
    torch.manual_seed(2)
    ref = mstr.MSTransception(num_classes=9,
                              br_ch_att_list=[False, False, False, False])
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, 224, 224)).astype(np.float32)
    from transception_tpu.core.config import TransceptionConfig
    cfg = TransceptionConfig(dtype="float32", use_pallas=False,
                             br_ch_att_list=(False, False, False, False))
    _convert_and_compare(ref, cfg, x, atol=2e-3)
