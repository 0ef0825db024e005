"""ROMAN-TPU: a TPU-native re-design of ROMAN (view-invariant multi-robot
global localization via open-set object map registration).

Reference system: mit-acl/roman (RSS 2025). This package re-implements every
capability of the reference as batched, static-shape JAX/XLA/Pallas programs
designed for TPU hardware:

- ``roman_tpu.ops``       — SE(3), batched Arun/Umeyama, shape attributes,
                            voxel grids, point-cloud ops, assignment solvers.
- ``roman_tpu.align``     — the ROMAN consistency invariant + a batched
                            CLIPPER densest-clique solver that registers *all
                            submap pairs at once* on the MXU (reference runs
                            one C++/CPU solve per pair: submap_align.py:93).
- ``roman_tpu.map``       — open-set object mapping front-end (segments,
                            submaps, GNN data association, lifecycle).
- ``roman_tpu.perception``— FastSAM-style segmentation + DINOv2/CLIP
                            embedding networks in flax, batched over frames.
- ``roman_tpu.rpgo``      — g2o I/O and a TPU-native robust pose-graph
                            optimizer (PCM gating + GNC-TLS Gauss-Newton)
                            replacing the reference's Kimera-RPGO subprocess.
- ``roman_tpu.params``    — YAML-backed config dataclasses, same schema as
                            the reference (roman/params/*).
- ``roman_tpu.parallel``  — device-mesh / sharding utilities (pair-grid
                            sharding over ICI).
- ``roman_tpu.sim``       — synthetic multi-robot world generation used by
                            tests and benchmarks.
"""

__version__ = "0.1.0"
