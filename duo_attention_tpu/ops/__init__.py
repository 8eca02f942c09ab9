"""TPU compute ops: jnp reference oracles + Pallas fast paths."""
