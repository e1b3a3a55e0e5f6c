from .export import pack_model
