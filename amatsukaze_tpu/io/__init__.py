"""Host I/O: y4m, wave, subprocess encoder/muxer drivers, frame pump."""
