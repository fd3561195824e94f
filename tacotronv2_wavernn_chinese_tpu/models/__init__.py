from . import attention, layers, tacotron  # noqa: F401
