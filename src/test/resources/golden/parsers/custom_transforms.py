def capitalise(v):
    return v.upper()
