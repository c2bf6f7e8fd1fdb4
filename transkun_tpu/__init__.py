"""transkun_tpu — TPU-native piano transcription framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of the reference Transkun system
(Yujia-Yan/Transkun): audio in, expressive MIDI out (onset/offset/pitch/
velocity + sustain/una-corda pedals), built on a neural semi-Markov CRF over
intervals decoded from an axial-attention transformer backbone.
"""

__version__ = "0.1.0"
