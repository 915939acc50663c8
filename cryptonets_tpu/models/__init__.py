"""L3: concrete encrypted-inference applications (ref app projects)."""
