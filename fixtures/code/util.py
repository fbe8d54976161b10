def add(a, b):
    return a + b

def mul(a, b):
    return a * b

class Helper:
    def run(self):
        return add(1, mul(2, 3))
