"""neural_sp_tpu — TPU-native end-to-end speech processing framework.

A ground-up JAX/XLA/Pallas/pjit re-design with the capabilities of
hirofumi0810/neural_sp (see SURVEY.md for the reference layer map).

Framework-wide special token ids (parity with reference
``neural_sp/models/seq2seq/speech2text.py:66-70``):
    blank = 0, unk = 1, eos = sos = 2, pad = 3
"""

BLANK = 0
UNK = 1
EOS = 2
SOS = 2
PAD = 3

__version__ = "0.1.0"
