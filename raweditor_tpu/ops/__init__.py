"""TPU compute kernels: demosaic, develop stack, histogram, sampling."""
