"""Headless visualization exports.

The reference's `MapViewer` (`include/common/map_viewer.h/.hpp`, ~3.5k LoC
of PCL/VTK windows with keyboard/mouse interaction) has no place on a
display-less TPU pod; its interactive role is covered by
:mod:`mulls_tpu.viz.html_viewer` — a single self-contained WebGL HTML file
(orbit controls, per-feature-class coloring + toggles, trajectory and
pose-graph overlays) that any browser can open, plus the offline rasters in
:mod:`mulls_tpu.mapping.assembly` (BEV / range image / occupancy map).
"""

from mulls_tpu.viz.html_viewer import export_html_viewer  # noqa: F401
