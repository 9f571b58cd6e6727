"""Stock discriminator pretrains (.pth) load into our flax MPD.

The reference's f0D*.pth files hold a torch MultiPeriodDiscriminator
state dict (`rvc/lib/algorithm/discriminators.py:25-50`); the converter
must map every tensor (S + P-per-period [+ R bank for v3]) onto our
tree so `--pretrained` finetunes against the stock D instead of a
random one.
"""

import sys

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat(v, p))
        else:
            out[p] = np.asarray(v)
    return out


@pytest.mark.parametrize("version", ["v2", "v3"])
def test_torch_mpd_roundtrip(version):
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from rvc.lib.algorithm.discriminators import MultiPeriodDiscriminator

    from rvc_tpu.configs import get_config
    from rvc_tpu.train.train_step import build_discriminator
    from rvc_tpu.utils.weights import convert_discriminator_state_dict

    tnet = MultiPeriodDiscriminator(version=version)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    tree = convert_discriminator_state_dict(sd)

    cfg = get_config(
        32000,
        model_vocoder="RefineGAN" if version == "v3" else "HiFi-GAN")
    net = build_discriminator(cfg)
    variables = net.init(jax.random.PRNGKey(0),
                         np.zeros((1, 3200, 1), np.float32),
                         np.zeros((1, 3200, 1), np.float32))
    ours = _flat(variables["params"])
    theirs = _flat(tree)

    missing = sorted(set(ours) - set(theirs))
    extra = sorted(set(theirs) - set(ours))
    assert not missing, f"unmapped target params: {missing[:8]}"
    assert not extra, f"unconsumed torch tensors: {extra[:8]}"
    for k in ours:
        assert ours[k].shape == theirs[k].shape, (
            k, ours[k].shape, theirs[k].shape)


@pytest.mark.slow  # 45-70s: nightly tier
def test_load_pretrained_d_pth(tmp_path):
    """trainer.load_pretrained ingests a .pth discriminator and rejects
    architecture mismatches loudly."""
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from rvc.lib.algorithm.discriminators import MultiPeriodDiscriminator

    from rvc_tpu.configs import get_config
    from rvc_tpu.train.data import DataLoader, RVCDataset
    from rvc_tpu.train.trainer import RVCTrainer

    tnet = MultiPeriodDiscriminator(version="v2")
    p = tmp_path / "f0D.pth"
    torch.save({"model": tnet.state_dict()}, str(p))

    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64,
                     train_segment_size=320 * 12)
    loader = DataLoader(RVCDataset([], cfg.data.hop_length), 2)
    tr = RVCTrainer(cfg, loader, checkpoint_dir=str(tmp_path / "ckpt"))
    before = _flat(jax.device_get(tr.state.d_params))
    tr.load_pretrained(d_path=str(p))
    after = _flat(jax.device_get(tr.state.d_params))
    changed = sum(not np.allclose(before[k], after[k]) for k in before)
    assert changed > len(before) * 0.9, f"only {changed}/{len(before)} updated"
