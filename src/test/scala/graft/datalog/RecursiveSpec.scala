package graft.datalog

/** Golden answers mirrored from the reference's RecursiveQuerySuite
  * (RecursiveQuerySuites.scala:20-189). */
class RecursiveDatalogSpec extends DatalogSuite {
  val database = "database({arc(From:integer, To:integer)})."

  val tcAnswers1 = Seq("[0,1]", "[1,2]", "[2,3]", "[3,4]", "[4,5]", "[0,6]", "[6,7]",
    "[7,8]", "[8,9]", "[9,10]", "[0,2]", "[1,3]", "[2,4]", "[3,5]", "[0,7]", "[6,8]",
    "[7,9]", "[8,10]", "[0,3]", "[1,4]", "[2,5]", "[0,8]", "[6,9]", "[7,10]", "[0,4]",
    "[1,5]", "[0,9]", "[6,10]", "[0,5]", "[0,10]")

  val tcAnswers2 = Seq("[1,0]", "[1,2]", "[2,3]", "[3,1]", "[3,4]", "[3,5]", "[5,8]",
    "[6,5]", "[6,7]", "[6,0]", "[1,3]", "[2,1]", "[2,4]", "[2,5]", "[3,0]", "[3,2]",
    "[3,8]", "[6,8]", "[1,1]", "[1,4]", "[1,5]", "[2,0]", "[2,2]", "[2,8]", "[3,3]",
    "[1,8]")

  test("TC left-linear") {
    val program = "leftLinearPaths(A,B) <- arc(A,B)." +
      "leftLinearPaths(A,B) <- leftLinearPaths(A,C), arc(C,B)."
    runCase(database + program, "leftLinearPaths(A,B).",
      Map("arc" -> Fixtures.graph1), tcAnswers1)
    runCase(database + program, "leftLinearPaths(A,B).",
      Map("arc" -> Fixtures.graph2), tcAnswers2)
  }

  test("TC left-linear with self-seeding exit rule") {
    val program = "leftLinearPaths(A,A) <- arc(A,_)." +
      "leftLinearPaths(A,B) <- leftLinearPaths(A,C), arc(C,B)."
    val answers1 = tcAnswers1 ++ Seq("[4,4]", "[9,9]", "[1,1]", "[6,6]", "[8,8]",
      "[3,3]", "[0,0]", "[7,7]", "[2,2]")
    val answers2 = tcAnswers2 ++ Seq("[6,6]", "[5,5]")
    runCase(database + program, "leftLinearPaths(A,B).",
      Map("arc" -> Fixtures.graph1), answers1)
    runCase(database + program, "leftLinearPaths(A,B).",
      Map("arc" -> Fixtures.graph2), answers2)
  }

  test("TC right-linear") {
    val program = "rightLinearPaths(A,B) <- arc(A,B)." +
      "rightLinearPaths(A,B) <- arc(A,C), rightLinearPaths(C,B)."
    runCase(database + program, "rightLinearPaths(A,B).",
      Map("arc" -> Fixtures.graph1), tcAnswers1)
    runCase(database + program, "rightLinearPaths(A,B).",
      Map("arc" -> Fixtures.graph2), tcAnswers2)
  }

  test("TC non-linear") {
    val program = "nonLinearPaths(A,B) <- arc(A,B)." +
      "nonLinearPaths(A,B) <- nonLinearPaths(A,C), nonLinearPaths(C,B)."
    runCase(database + program, "nonLinearPaths(A,B).",
      Map("arc" -> Fixtures.graph1), tcAnswers1)
    runCase(database + program, "nonLinearPaths(A,B).",
      Map("arc" -> Fixtures.graph2), tcAnswers2)
  }

  test("TC bound first argument") {
    val program = "leftLinearPaths(A,B) <- arc(A,B)." +
      "leftLinearPaths(A,B) <- leftLinearPaths(A,C), arc(C,B)."
    runCase(database + program, "leftLinearPaths(0,B).",
      Map("arc" -> Fixtures.graph1),
      Seq("[0,1]", "[0,6]", "[0,2]", "[0,7]", "[0,3]", "[0,8]", "[0,4]", "[0,9]",
        "[0,5]", "[0,10]"))
    runCase(database + program, "leftLinearPaths(3,B).",
      Map("arc" -> Fixtures.graph2),
      Seq("[3,1]", "[3,4]", "[3,5]", "[3,0]", "[3,2]", "[3,8]", "[3,3]"))
  }

  test("Reach with tuple seed") {
    def program(startVertex: Int) =
      s"reach(A) <- A=$startVertex." +
        "reach(A) <- reach(B), arc(B,A)."
    runCase(database + program(0), "reach(A).", Map("arc" -> Fixtures.graph1),
      Seq("[0]", "[1]", "[2]", "[3]", "[4]", "[5]", "[6]", "[7]", "[8]", "[9]", "[10]"))
    runCase(database + program(1), "reach(A).", Map("arc" -> Fixtures.graph2),
      Seq("[0]", "[1]", "[2]", "[3]", "[4]", "[5]", "[8]"))
  }

  test("mutual recursion") {
    val program = "three(A,B,C) <- arc(A,B), arc(B,C)." +
      "three(A,B,D) <- three2(A,B,C), arc(C,D)." +
      "three2(A,B,D) <- three(A,B,C), arc(C,D)."
    runCase(database + program, "three(A,B,C).", Map("arc" -> Fixtures.graph1),
      Seq("[0,1,2]", "[1,2,3]", "[2,3,4]", "[3,4,5]", "[0,6,7]", "[6,7,8]", "[7,8,9]",
        "[8,9,10]", "[0,1,4]", "[1,2,5]", "[0,6,9]", "[6,7,10]"))
    runCase(database + program, "three(A,B,C).", Map("arc" -> Fixtures.graph2),
      Seq("[1,2,3]", "[2,3,1]", "[2,3,4]", "[2,3,5]", "[3,1,0]", "[3,1,2]", "[3,5,8]",
        "[6,5,8]", "[1,2,0]", "[1,2,2]", "[1,2,8]", "[2,3,3]", "[3,1,1]", "[3,1,4]",
        "[3,1,5]", "[1,2,1]", "[1,2,4]", "[1,2,5]", "[2,3,0]", "[2,3,2]", "[2,3,8]",
        "[3,1,3]", "[3,1,8]"))
  }

  test("same generation") {
    val db = "database({parent_child(Parent:integer, Child:integer)})."
    val program = "same_generation(X,Y) <- parent_child(Parent,X), parent_child(Parent,Y), X ~= Y." +
      "same_generation(X,Y) <- parent_child(A,X), same_generation(A,B), parent_child(B,Y)."
    runCase(db + program, "same_generation(A,B)",
      Map("parent_child" -> Fixtures.parentChild),
      Seq("[8,9]", "[9,6]", "[6,9]", "[9,8]", "[8,6]", "[5,4]", "[4,5]", "[6,8]"))
    runCase(db + program, "same_generation(A,B)",
      Map("parent_child" -> Fixtures.parentChild2),
      Seq("[-1,1]", "[1,-1]", "[-2,2]", "[2,-2]", "[-3,3]", "[3,-3]", "[-4,4]",
        "[4,-4]", "[-5,5]", "[5,-5]"))
  }

  test("TC with rotated head variables (fff)") {
    val program = "leftLinearPaths(A,B,B) <- arc(A,B)." +
      "leftLinearPaths(B,C,D) <- leftLinearPaths(A,B,C), arc(C,D)."
    runCase(database + program, "leftLinearPaths(A,B,C).",
      Map("arc" -> Fixtures.graph7),
      Seq("[0,1,1]", "[0,2,2]", "[2,1,1]", "[1,3,3]", "[3,1,1]", "[1,0,0]",
        "[1,1,3]", "[1,1,0]", "[2,2,1]", "[3,3,1]", "[0,0,1]", "[0,0,2]",
        "[1,3,1]", "[1,0,1]", "[1,0,2]", "[2,1,3]", "[2,1,0]", "[3,1,3]",
        "[3,1,0]", "[0,1,3]", "[0,1,0]", "[0,2,1]"))
  }

  test("Multi-Level Marketing (recursion + stratified float aggregation)") {
    val db = "database({" +
      "sponsor(M:integer, NM:integer), " +
      "sales(M:integer, S:float, P:float), " +
      "schedule(LS:float, RS:float, BP:float)})."
    val program = "member_sales(M, sum<S>) <- sales(M, S, _)." +
      "network_tc(M, M) <- sponsor(M, _)." +
      "network_tc(M, M) <- sponsor(_, M)." +
      "network_tc(M, M2) <- network_tc(M, M1), sponsor(M1, M2)." +
      "member_total_sales(M, sum<S>) <- network_tc(M, NM), member_sales(NM, S)." +
      "member_bonus_self(M, B) <- member_sales(M, ST), member_total_sales(M, S), schedule(LS, RS, BP), S >= LS, S < RS, B = ST * BP." +
      "member_bonus_frontline(M, sum<B>) <- sponsor(M, NM), member_total_sales(NM, S), schedule(LS, RS, BP), S >= LS, S < RS, B = S * BP." +
      "bonus(sum<B>) <- member_bonus_self(M,B1), member_bonus_frontline(M,B2), B=B1+B2." +
      "gross_profit(sum<P>) <- sales(_, _, P)." +
      "net_profit(NP) <- gross_profit(P), bonus(B), NP = P - B."
    val data = Map("sponsor" -> Fixtures.mlmSponsors, "sales" -> Fixtures.mlmSales,
      "schedule" -> Fixtures.mlmSchedule)
    runCase(db + program, "network_tc(A,B)", data,
      Seq("[1,1]", "[2,2]", "[3,3]", "[4,4]", "[1,2]", "[1,3]", "[2,4]", "[1,4]"))
    runCase(db + program, "member_sales(A,B)", data,
      Seq("[1,179.0]", "[2,39.0]", "[3,19.0]", "[4,94.0]", "[5,117.0]"))
    runCase(db + program, "member_total_sales(A,B)", data,
      Seq("[1,331.0]", "[2,133.0]", "[3,19.0]", "[4,94.0]"))
    runCase(db + program, "member_bonus_self(A,B)", data,
      Seq("[1,10.739999759942293]", "[2,1.169999973848462]"))
    runCase(db + program, "member_bonus_frontline(A,B)", data,
      Seq("[1,3.9899999108165503]"))
    runCase(db + program, "gross_profit(A)", data, Seq("[110.0]"))
    // DELIBERATE DEVIATION from the reference's expected answers
    // (RecursiveQuerySuites.scala:172-173: bonus=[19.889999555423856],
    // net_profit=[90.11000044457614]): those values equal the CROSS
    // PRODUCT of member_bonus_self × member_bonus_frontline —
    // (10.74+3.99)+(1.17+3.99) — i.e. the DeAL compiler dropped the
    // shared join variable M (absent from the head) before extracting
    // join conditions. Standard Datalog semantics join on M, giving
    // 10.74+3.99 only; the reference itself joins derived predicates
    // on shared variables elsewhere (member_total_sales). We implement
    // the standard semantics.
    runCase(db + program, "bonus(A)", data, Seq("[14.729999670758843]"))
    runCase(db + program, "net_profit(A)", data, Seq("[95.27000032924116]"))
  }

  test("strongly connected components over a cyclic graph (dl_scc shape)") {
    // 0→1→2→0 (3-cycle), 2→3→4 (chain), 4⇄5 (2-cycle): the semi-naive
    // closure must terminate on the cycles, and scc_id(v) =
    // min({v} ∪ {u : v ⇄ u}) condenses them
    val db = "database({sarc(X:integer, Y:integer), node(X:integer)})."
    val program =
      "stc(A,B) <- sarc(A,B). stc(A,B) <- stc(A,C), sarc(C,B). " +
        "mut(A,B) <- stc(A,B), stc(B,A). " +
        "mut(A,B) <- node(A), B=A. " +
        "sccid(A,min<B>) <- mut(A,B)."
    val data = Map(
      "sarc" -> Seq("0,1", "1,2", "2,0", "2,3", "3,4", "4,5", "5,4"),
      "node" -> Seq("0", "1", "2", "3", "4", "5"))
    runCase(db + program, "sccid(A,B).", data,
      Seq("[0,0]", "[1,0]", "[2,0]", "[3,3]", "[4,4]", "[5,4]"))
  }
}
