from . import hashing, insert, probe, partition, sortops

__all__ = ["hashing", "insert", "probe", "partition", "sortops"]
