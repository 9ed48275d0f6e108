"""(stub — filled in this round)"""
