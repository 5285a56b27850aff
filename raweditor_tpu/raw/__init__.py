"""Host-side RAW decode: containers, sensor decompressors, metadata."""
