"""Headless rendering: cameras, volume ray-marching, molecule impostors.

TPU-native replacement for the reference's OpenGL L6 layer (SURVEY.md §1):
the GLSL single-pass DVR+iso ray-marcher (src/shaders/volume/raycaster.frag)
and the md_gl molecule rasterizer become jitted JAX/Pallas programs that
produce framebuffers headlessly; the postprocess chain (tonemap, AO, FXAA,
TAA) becomes array passes over those framebuffers.
"""
