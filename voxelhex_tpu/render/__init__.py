"""Renderers.

* :mod:`voxelhex_tpu.render.oracle` — scalar NumPy raytracer over the flat
  snapshot; the ground-truth renderer every device kernel is validated
  against.
* :mod:`voxelhex_tpu.render.camera` — viewport/camera math shared by all
  render paths.
* :mod:`voxelhex_tpu.render.jax_renderer` — vectorized jitted JAX renderer.
"""
