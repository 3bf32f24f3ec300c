import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointrcnn_tpu.config import default_config, load_config, merge_from_list
from pointrcnn_tpu.models.layers import BatchNorm, ConvBN


def test_batchnorm_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x1 = rng.randn(4, 16, 8).astype(np.float32)
    x2 = rng.randn(4, 16, 8).astype(np.float32)

    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x1), train=True, momentum=0.1)

    tbn = torch.nn.BatchNorm1d(8, momentum=0.1)
    tbn.train()

    state = variables
    for x in (x1, x2):
        out, mut = bn.apply(state, jnp.asarray(x), train=True, momentum=0.1,
                            mutable=["batch_stats"])
        state = {"params": state["params"], "batch_stats": mut["batch_stats"]}
        tout = tbn(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1)
        np.testing.assert_allclose(np.asarray(out), tout.detach().numpy(), atol=1e-4)

    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["var"]),
        tbn.running_var.numpy(), atol=1e-4,
    )

    # eval mode uses running stats
    bn_out = bn.apply(state, jnp.asarray(x1), train=False, momentum=0.1)
    tbn.eval()
    t_out = tbn(torch.from_numpy(x1).permute(0, 2, 1)).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(bn_out), t_out.detach().numpy(), atol=1e-4)


def test_config_yaml_and_overrides(tmp_path):
    yaml_file = tmp_path / "t.yaml"
    yaml_file.write_text("RPN:\n    LOC_XZ_FINE: True\n    NUM_POINTS: 2048\nTRAIN:\n    LR: 0.01\n")
    cfg = load_config(str(yaml_file), ["RCNN.ENABLED", "True", "RPN.LOC_SCOPE", "2.0"])
    assert cfg.RPN.LOC_XZ_FINE is True
    assert cfg.RPN.NUM_POINTS == 2048
    assert cfg.TRAIN.LR == 0.01
    assert cfg.RCNN.ENABLED is True
    assert cfg.RPN.LOC_SCOPE == 2.0
    # frozen
    with pytest.raises(TypeError):
        cfg.RPN.NUM_POINTS = 1


def test_config_rejects_unknown_and_type_mismatch(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("RPN:\n    NOT_A_KEY: 1\n")
    with pytest.raises(KeyError):
        load_config(str(bad))
    bad2 = tmp_path / "bad2.yaml"
    bad2.write_text("RPN:\n    NUM_POINTS: hello\n")
    with pytest.raises(ValueError):
        load_config(str(bad2))


def test_config_hashable_for_jit():
    a = default_config().freeze()
    b = default_config().freeze()
    assert hash(a) == hash(b)
    assert a == b
    c = merge_from_list(default_config().freeze(), ["RPN.NUM_POINTS", "1024"])
    assert hash(c) != hash(a) or c != a


def test_convbn_bias_convention():
    x = jnp.ones((2, 4, 3))
    m_bn = ConvBN(8, bn=True)
    v = m_bn.init(jax.random.PRNGKey(0), x)
    assert "bias" not in v["params"]["Dense_0"]  # no bias under BN
    m_plain = ConvBN(8, bn=False)
    v2 = m_plain.init(jax.random.PRNGKey(0), x)
    assert "bias" in v2["params"]["Dense_0"]
