from .structure import generate_sigma_u, object_counts, remove_adjacent
