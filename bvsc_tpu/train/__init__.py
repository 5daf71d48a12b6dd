"""Trainers: BVRNN VAE trainer and vocoder GAN trainer (data-parallel)."""
