"""Evaluation / inference layer (reference ``contrast_gan_3D/eval/``):
full-volume contrast correction, HU-distribution-shift and marker-recall-rate
metrics, and device-parallel patient fan-out."""
