"""Hot kernels: jnp reference implementations + Pallas TPU variants."""
