from . import iqfile, rtltcp, zmqpub

__all__ = ["iqfile", "rtltcp", "zmqpub"]
