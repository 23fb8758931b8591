"""Test environment: force CPU with 8 virtual devices (JAX's standard fake
multi-device mechanism — the TPU-world equivalent of a fake backend, see
SURVEY.md §4) before jax initializes."""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (the real-TPU
# tunnel) and a sitecustomize imports jax at interpreter startup, so the env
# var alone is read too early to override — use jax.config.update, which works
# as long as no backend has been initialized yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from feddat_tpu.configs.core import (  # noqa: E402
    AdapterSpec,
    OptimizerConfig,
    ViltModelConfig,
)
from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner  # noqa: E402
from feddat_tpu.models.adapters import MODE_INIT  # noqa: E402


TINY_VILT = ViltModelConfig(
    vocab_size=100,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    max_text_len=8,
    image_size=(32, 32),
    patch_size=16,
    adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=4),
)


def tiny_batch(rng: np.random.RandomState, batch_size=4, cfg=TINY_VILT, num_labels=16):
    ids = rng.randint(1, cfg.vocab_size, size=(batch_size, cfg.max_text_len)).astype(np.int32)
    answers = ids[:, 0] % num_labels
    targets = np.zeros((batch_size, num_labels), dtype=np.float32)
    targets[np.arange(batch_size), answers] = 1.0
    return {
        "input_ids": ids,
        "attention_mask": np.ones((batch_size, cfg.max_text_len), np.int32),
        "pixel_values": rng.randn(batch_size, *cfg.image_size, 3).astype(np.float32),
        "target_scores": targets,
    }


@pytest.fixture(scope="session")
def tiny_model():
    model = ViltContinualLearner(TINY_VILT, {"coco": TaskHeadSpec(num_labels=16)})
    rng = np.random.RandomState(0)
    batch = tiny_batch(rng)
    from feddat_tpu.models.vilt import init_vilt_params

    params = init_vilt_params(model, jax.random.PRNGKey(0), batch)
    return model, params
