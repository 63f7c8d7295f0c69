from .write import prepare_destination, write_to_destination

__all__ = ["prepare_destination", "write_to_destination"]
