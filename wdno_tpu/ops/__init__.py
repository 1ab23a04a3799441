from . import wavelet, packing
