/** Built-in sample puzzles for the player (framework test fixtures).
 * Each entry carries the `.pwp` text and a known solution (action chars
 * LRUD) — used by the in-browser smoke test and the hint button. */
const SAMPLE_PUZZLES = {
  "push right": {
    pwp: `.  .  .  .
A  M0 .  G0
.  .  .  .`,
    solution: "RR",
  },
  "chain push": {
    pwp: `A  M1 M0 .  G0`,
    solution: "RR",
  },
  "around the corner": {
    pwp: `.  .  A  .
.  M0 M0 .
.  M0+G0 .  .
.  .  .  .`,
    solution: "D",
  },
  "two goals": {
    pwp: `.  G0 .  .
A  M0 .  .
.  M1 .  G1`,
    solution: "DRRLU",
  },
  "agent walls": {
    pwp: `A  M1 AW+G1 .`,
    solution: "R",
  },
  "two tools": {
    pwp: ` A  .
 M2 AW
 M1 AW
 M0 AW
 .  AW
 G0 AW`,
    solution: "DD",
  },
};
