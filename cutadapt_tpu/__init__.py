"""
cutadapt-tpu: a TPU-native adapter-trimming engine.

A from-scratch reimplementation of the capabilities of cutadapt
(reference: marcelm/cutadapt) designed TPU-first: the hot alignment,
k-mer prefilter and quality-trimming kernels are batched JAX/Pallas
programs over fixed-shape encoded read tensors, while an exact
host-side implementation guarantees byte-level output parity with the
reference on arbitrary inputs.
"""

__version__ = "0.1.0"

# Version string reported in place of the reference's cutadapt version.
# (Reference: src/cutadapt/cli.py:1394 embeds its version in the JSON report.)
COMPAT_VERSION = "5.2"
