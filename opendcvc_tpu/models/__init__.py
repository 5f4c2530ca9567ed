from .dmci import DMCI

__all__ = ["DMCI"]


def __getattr__(name):
    # DMC imports lazily to keep the image-only path light.
    if name == "DMC":
        from .dmc import DMC
        return DMC
    raise AttributeError(name)
