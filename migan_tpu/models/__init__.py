"""Model zoo: MI-GAN inference/training nets, StyleGAN2 blocks, Co-Mod-GAN."""

from . import migan_inference

__all__ = ["migan_inference"]
