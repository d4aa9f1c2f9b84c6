"""Renderers.

* :mod:`voxelhex_tpu.render.oracle` — scalar NumPy raytracer over the flat
  snapshot; the ground-truth renderer every device kernel is validated
  against.
* :mod:`voxelhex_tpu.render.camera` — viewport/camera math shared by all
  render paths.
* :mod:`voxelhex_tpu.render.jax_renderer` — vectorized jitted JAX renderer.
"""


def fastest_renderer(flat, **kwargs):
    """The fastest available device renderer for this snapshot (the Pallas
    kernel when present and applicable, else the wavefront renderer)."""
    from voxelhex_tpu.render.wavefront import WavefrontRenderer

    return WavefrontRenderer(flat, **kwargs)
