"""Multimodal (image/audio/video) binary-column surface."""
