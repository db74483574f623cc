"""Root-level shim preserving the reference's module layout
(/root/reference/visualizers.py is a repo-root script): the implementation
lives in the package so library consumers (e.g. the training loop's visual
diagnostics) can import it from any working directory."""

from posenet_tpu.visualizers import (  # noqa: F401
    draw_coordinates_to_image_file, draw_displacement_vectors, print_heatmap)
