"""Host data plane: FASTQ streaming, decompression, batching.

Python implementations here; the C++ fast path (native/) plugs in behind the
same interfaces and is used automatically when built.
"""
