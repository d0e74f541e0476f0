"""Native (C++) host-side components.

Currently: grid_subsampling_ext — the voxel-grid subsampler used by the grid
dataset pipelines (offline preprocessing over ragged clouds; the TPU-native
equivalent of the reference's cpp_wrappers/cpp_subsampling CPython extension).

Build in-place with:
    python pointasnl_tpu/native/setup.py build_ext --inplace
(or `bash pointasnl_tpu/native/build.sh`). All consumers fall back to the
vectorized numpy implementation when the extension is absent.
"""
