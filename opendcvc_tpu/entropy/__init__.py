from .cdf import pmf_to_quantized_cdf, pmf_to_cdf
from .coder import EntropyCoder
from .models import BitEstimator, GaussianEncoder

__all__ = ["pmf_to_quantized_cdf", "pmf_to_cdf", "EntropyCoder",
           "BitEstimator", "GaussianEncoder"]
