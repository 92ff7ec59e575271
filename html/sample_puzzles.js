/** Built-in sample puzzles for the player (framework test fixtures). */
const SAMPLE_PUZZLES = {
  "push right": `.  .  .  .
A  M0 .  G0
.  .  .  .`,
  "chain push": `A  M1 M0 .  G0`,
  "around the corner": `.  .  A  .
.  M0 M0 .
.  M0+G0 .  .
.  .  .  .`,
  "two goals": `.  G0 .  .
A  M0 .  .
.  M1 .  G1`,
  "agent walls": `A  M1 AW+G1 .`,
  "two tools": ` A  .
 M2 AW
 M1 AW
 M0 AW
 .  AW
 G0 AW`,
};
