"""Quaternion-valued neural networks (channels = [r | i | j | k])."""
