def getFloat(v):
    return float(v)
