function main() {
  console.log("hello");
}

function helper(x) {
  return x * 2;
}
