"""Renderers.

* :mod:`voxelhex_tpu.render.oracle` — scalar NumPy raytracer over the flat
  snapshot; the ground-truth renderer every device kernel is validated
  against.
* :mod:`voxelhex_tpu.render.camera` — viewport/camera math shared by all
  render paths.
* :mod:`voxelhex_tpu.render.jax_renderer` — vectorized jitted JAX renderer.
"""


def fastest_renderer(flat, **kwargs):
    """The fastest available device renderer.

    Accepts a BoxTree, FlatTree or BitGrid; the BitGrid (dense hierarchical
    bitmap) renderer is the TPU-tuned hot path."""
    from voxelhex_tpu.render.bitgrid import BitGridRenderer

    # measured on TPU: compaction alone beats prepass+compaction (the extra
    # prepass trace sessions cost more than the head start saves)
    kwargs.setdefault("prepass", False)
    return BitGridRenderer(flat, **kwargs)
