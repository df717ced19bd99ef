"""Probe: can Mosaic slice (8,128) int16 from a (512,128) int16 VMEM ref
and widen to int32 for take_along_axis?"""
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(i16_ref, x_ref, out_ref):
    for s in range(2):
        idx = i16_ref[s * 8 : (s + 1) * 8, :].astype(jnp.int32)
        g = jnp.take_along_axis(
            jnp.broadcast_to(x_ref[0:1, :], (8, 128)), idx, axis=1,
            mode="promise_in_bounds",
        )
        out_ref[s * 8 : (s + 1) * 8, :] = g


i16 = jnp.asarray(np.random.default_rng(0).integers(0, 128, (16, 128)), jnp.int16)
x = jnp.asarray(np.arange(128, dtype=np.float32).reshape(1, 128))
out = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(i16, x)
expect = np.arange(128, dtype=np.float32)[np.asarray(i16)]
print("int16 slice+gather OK:", np.array_equal(np.asarray(out), expect))
