"""Import helper for the reference TF2 modules under Keras 3 / modern NumPy.

Used by the weight-transplant parity tests. The reference passes `training`
positionally (Keras 3 forbids it), uses np.math.pi (removed), and imports
tensorflow_addons (absent) — shimmed here exactly as in
tools/measure_tf_baseline.py.
"""

import math
import sys
import types

_READY = False


def load_reference_modules():
    """Returns (generator, sunpose_net, discriminator, sunrad_net, tf_utils,
    grad_cam, tf) reference modules, shimmed. Raises ImportError without TF."""
    global _READY
    import numpy as np
    import tensorflow as tf

    if not _READY:
        np.math = math

        _tfa = types.ModuleType("tensorflow_addons")
        _tfa.layers = types.ModuleType("tensorflow_addons.layers")
        _tfa.image = types.ModuleType("tensorflow_addons.image")

        class InstanceNormalization(tf.keras.layers.GroupNormalization):
            def __init__(self, **kw):
                kw.setdefault("groups", -1)
                kw.setdefault("name", "instance_normalization")
                super().__init__(**kw)

        _tfa.layers.InstanceNormalization = InstanceNormalization
        _tfa.image.gaussian_filter2d = None
        sys.modules["tensorflow_addons"] = _tfa
        sys.modules["tensorflow_addons.layers"] = _tfa.layers
        sys.modules["tensorflow_addons.image"] = _tfa.image

        import keras

        layer_cls = keras.src.layers.layer.Layer
        orig_call = layer_cls.__call__

        def patched_call(self, *args, **kw):
            if len(args) >= 2 and isinstance(args[-1], (bool, str)):
                kw.setdefault(
                    "training",
                    args[-1] if isinstance(args[-1], bool) else True,
                )
                args = args[:-1]
            return orig_call(self, *args, **kw)

        layer_cls.__call__ = patched_call
        _READY = True

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    import generator as ref_gen
    import sunpose_net as ref_sun
    import discriminator as ref_disc
    import sunrad_net as ref_sunrad
    import tf_utils as ref_tf_utils
    import grad_cam as ref_grad_cam

    return ref_gen, ref_sun, ref_disc, ref_sunrad, ref_tf_utils, ref_grad_cam, tf
