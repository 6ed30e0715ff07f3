"""(round 1 placeholder — filled in as operators land)"""
