"""Reparameterized prompt tuning.

Reference (``src/train/main.py:214-229`` + ``src/modeling/prompted_output.py``):
prompt length 5, embedding reparameterized through a bottleneck MLP
(``Embedding(P, d) -> Linear(d, d/4) -> Tanh -> Linear(d/4, d)``), spliced
into the token streams right after the CLS position with matching mask
extension.  Here prompts are first-class flax modules selected by the PROMPT
PEFT mode (the reference monkey-patches ``forward`` with ``types.MethodType``).

Note: the reference's ViLT path reuses the *text* prompt MLP for the visual
prompt (``prompted_output.py:253-255``), leaving ``prompt_embedding_vis``
untrained — here each stream uses its own module.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from feddat_tpu.configs.core import PromptSpec


class ReparamPrompt(nn.Module):
    """-> [length, hidden] prompt embeddings."""

    spec: PromptSpec
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        # torch-default inits (the reference applies no init_bert_weights to
        # the prompt MLP, ``main.py:214-229``): Embedding ~ N(0,1); Linear
        # weights ~ kaiming_uniform(a=sqrt(5)) = U(+-1/sqrt(fan_in)), biases
        # ~ U(+-1/sqrt(fan_in)).  BERT-style std=0.02 would start the MLP in
        # its linear regime with ~50x smaller prompts than the reference.
        w_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

        def bias_init(fan_in):
            bound = 1.0 / (fan_in ** 0.5)
            return lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -bound, bound
            )

        tokens = jnp.arange(self.spec.length)
        x = nn.Embed(
            self.spec.length,
            self.hidden_size,
            embedding_init=nn.initializers.normal(stddev=1.0),
            dtype=self.dtype,
            name="prompt_embed",
        )(tokens)
        x = nn.Dense(
            self.spec.bottleneck,
            kernel_init=w_init,
            bias_init=bias_init(self.hidden_size),
            dtype=self.dtype,
            name="prompt_down",
        )(x)
        x = jnp.tanh(x)
        return nn.Dense(
            self.hidden_size,
            kernel_init=w_init,
            bias_init=bias_init(self.spec.bottleneck),
            dtype=self.dtype,
            name="prompt_up",
        )(x)


def splice_after_cls(tokens: jnp.ndarray, mask: jnp.ndarray, prompt: jnp.ndarray):
    """Insert [P, d] prompts after position 0; extend the {0,1} mask."""
    b = tokens.shape[0]
    p = jnp.broadcast_to(prompt[None], (b,) + prompt.shape).astype(tokens.dtype)
    out = jnp.concatenate([tokens[:, :1], p, tokens[:, 1:]], axis=1)
    pm = jnp.ones((b, prompt.shape[0]), dtype=mask.dtype)
    out_mask = jnp.concatenate([mask[:, :1], pm, mask[:, 1:]], axis=1)
    return out, out_mask
