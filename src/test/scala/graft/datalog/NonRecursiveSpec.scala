package graft.datalog

/** Golden answers mirrored from the reference's RelationalQuerySuite
  * (NonRecursiveQuerySuites.scala:20-111). */
class RelationalDatalogSpec extends DatalogSuite {
  val database = "database({" +
    "employee(EmployeeId:integer, DepartmentId:integer, FirstName:string, LastName:string)," +
    "department(DepartmentId:integer, DepartmentName:string)," +
    "employee_salary(EmployeeId:integer, Salary:double, Start:datetime, End:datetime)," +
    "address(EmployeeId:integer, Street:string, City:string, State:string, Zip:integer)" +
    "})."

  test("base relation scan") {
    runCase(database, "employee(EmployeeId, DepartmentId, FirstName, LastName).",
      Map("employee" -> Fixtures.employee),
      Seq("[1,1,Bob,Jones]", "[2,1,Jane,Jones]", "[3,2,Sam,Johnson]"))
  }

  test("constant filter on base relation") {
    runCase(database, "employee(EmployeeId,DepartmentId,'Bob',LastName).",
      Map("employee" -> Fixtures.employee),
      Seq("[1,1,Bob,Jones]"))
  }

  test("datetime comparison filters") {
    val program = "employeeSalaryHistory(EmployeeID, Salary, Start, End) <- " +
      "employee_salary(EmployeeID, Salary, Start, End), Start <= '2010-12-01', End >= '2014-01-01'."
    runCase(database + program, "employeeSalaryHistory(EmployeeID, Salary, Start, End).",
      Map("employee" -> Fixtures.employee, "employee_salary" -> Fixtures.employeeSalary),
      Seq("[1,50000.0,2010-12-01,2079-01-01]"))
  }

  test("projection with anonymous variables") {
    val program = "employeeNames(FirstName, LastName) <- employee(_,_,FirstName, LastName)."
    runCase(database + program, "employeeNames(FirstName, LastName).",
      Map("employee" -> Fixtures.employee),
      Seq("[Sam,Johnson]", "[Jane,Jones]", "[Bob,Jones]"))
  }

  test("two-way join") {
    val program = "employeeSalary(FirstName, Salary) <- employee(EmployeeId, _, FirstName,_), employee_salary(EmployeeId, Salary,_,_)."
    runCase(database + program, "employeeSalary(FirstName, Salary).",
      Map("employee" -> Fixtures.employee, "employee_salary" -> Fixtures.employeeSalary),
      Seq("[Bob,50000.0]", "[Jane,60000.0]"))
  }

  test("join with numeric filter") {
    val program = "highEarners(FirstName, LastName, Salary) <- employee(EmployeeId, _, FirstName,LastName), " +
      "employee_salary(EmployeeId, Salary,_,_), Salary > 50000."
    runCase(database + program, "highEarners(FirstName, LastName, Salary).",
      Map("employee" -> Fixtures.employee, "employee_salary" -> Fixtures.employeeSalary),
      Seq("[Jane,Jones,60000.0]"))
  }

  test("three-way join") {
    val program = "employeeAddressDepartment(EmployeeId, DepartmentId, FirstName, LastName, Street, City, State, Zip, DepartmentName) <-" +
      "employee(EmployeeId, DepartmentId, FirstName, LastName), address(EmployeeId, Street, City, State, Zip), department(DepartmentId, DepartmentName)."
    runCase(database + program,
      "employeeAddressDepartment(EmployeeId, DepartmentId, FirstName, LastName, Street, City, State, Zip, DepartmentName).",
      Map("employee" -> Fixtures.employee, "department" -> Fixtures.department,
        "address" -> Fixtures.address),
      Seq("[2,1,Jane,Jones,455 1st ave.,New York City,AZ,10001,Finance]",
        "[1,1,Bob,Jones,123 Main Street,Los Angeles,CA,90202,Finance]"))
  }

  test("arithmetic in assignment") {
    val program = "employeeSalaryAddition(FirstName, LastName, AdjustedSalary) <- employee(EmployeeId, _, FirstName, LastName)," +
      "employee_salary(EmployeeId, Salary, _, _), AdjustedSalary = Salary + 5000."
    runCase(database + program, "employeeSalaryAddition(FirstName, LastName, AdjustedSalary).",
      Map("employee" -> Fixtures.employee, "employee_salary" -> Fixtures.employeeSalary),
      Seq("[Jane,Jones,65000.0]", "[Bob,Jones,55000.0]"))
  }

  test("multi-rule union") {
    val program =
      "westCoastEmployees(EmployeeID, FirstName, LastName) <- employee(EmployeeID, _, FirstName, LastName), address(EmployeeID, _, _, 'AZ', _)." +
        "westCoastEmployees(EmployeeID, FirstName, LastName) <- employee(EmployeeID, _, FirstName, LastName), address(EmployeeID, _, _, 'CA', _)." +
        "westCoastEmployees(EmployeeID, FirstName, LastName) <- employee(EmployeeID, _, FirstName, LastName), address(EmployeeID, _, _, 'ID', _)." +
        "westCoastEmployees(EmployeeID, FirstName, LastName) <- employee(EmployeeID, _, FirstName, LastName), address(EmployeeID, _, _, 'NV', _)."
    runCase(database + program, "westCoastEmployees(EmployeeID, FirstName, LastName).",
      Map("employee" -> Fixtures.employee, "address" -> Fixtures.address),
      Seq("[1,Bob,Jones]", "[2,Jane,Jones]"))
  }
}

/** Mirrors NonMonotonicAggregateQuerySuite (NonRecursiveQuerySuites.scala:113-216). */
class AggregateDatalogSpec extends DatalogSuite {
  val database = "database({price(Price:integer, ItemName:string, ItemGroup:string)})."
  val data = Map("price" -> Fixtures.prices)

  test("global max") {
    runCase(database + "max_price(max<Price>) <- price(Price, _, _).",
      "max_price(M).", data, Seq("[10]"))
  }
  test("grouped max") {
    runCase(database + "max_price(ItemGroup, max<Price>) <- price(Price, _, ItemGroup).",
      "max_price(ItemGroup, M).", data, Seq("[a,10]", "[b,5]", "[c,5]", "[d,10]"))
  }
  test("two group cols max") {
    runCase(database + "max_price(ItemName, ItemGroup, max<Price>) <- price(Price, ItemName, ItemGroup).",
      "max_price(ItemName, ItemGroup, M).", data,
      Seq("[gamma,a,8]", "[gamma,d,8]", "[beta,a,9]", "[beta,d,9]", "[alpha,a,10]",
        "[alpha,d,10]", "[zeta,b,5]", "[zeta,c,5]", "[kappa,b,1]", "[kappa,c,1]",
        "[eta,b,4]", "[eta,c,4]", "[theta,b,3]", "[theta,c,3]", "[iota,b,2]",
        "[iota,c,2]", "[delta,a,7]", "[delta,d,7]", "[epsilon,a,6]", "[epsilon,d,6]"))
  }
  test("global min") {
    runCase(database + "min_price(min<Price>) <- price(Price, _, _).",
      "min_price(M).", data, Seq("[1]"))
  }
  test("grouped min") {
    runCase(database + "min_price(ItemGroup, min<Price>) <- price(Price, _, ItemGroup).",
      "min_price(ItemGroup, M).", data, Seq("[d,6]", "[c,1]", "[a,6]", "[b,1]"))
  }
  test("global avg") {
    runCase(database + "avg_price(avg<Price>) <- price(Price, _, _).",
      "avg_price(A).", data, Seq("[5.5]"))
  }
  test("grouped avg") {
    runCase(database + "avg_price(ItemGroup, avg<Price>) <- price(Price, _, ItemGroup).",
      "avg_price(ItemGroup, A).", data, Seq("[d,8.0]", "[c,3.0]", "[a,8.0]", "[b,3.0]"))
  }
  test("string constant selects aggregate group") {
    val program = "avg_price_a(A) <- avg_price(a,A)." +
      "avg_price(ItemGroup, avg<Price>) <- price(Price, _, ItemGroup)."
    runCase(database + program, "avg_price_a(A).", data, Seq("[8.0]"))
  }
  test("global count") {
    runCase(database + "count_price(count<Price>) <- price(Price, _, _).",
      "count_price(C).", data, Seq("[20]"))
  }
  test("grouped count") {
    runCase(database + "count_price(ItemGroup, count<Price>) <- price(Price, _, ItemGroup).",
      "count_price(ItemGroup, C).", data,
      Seq("[d,5]", "[c,5]", "[a,5]", "[b,5]"))
  }
  test("global sum") {
    runCase(database + "sum_price(sum<Price>) <- price(Price, _, _).",
      "sum_price(S).", data, Seq("[110]"))
  }
  test("grouped sum") {
    runCase(database + "sum_price(ItemGroup, sum<Price>) <- price(Price, _, ItemGroup).",
      "sum_price(ItemGroup, S).", data, Seq("[d,40]", "[c,15]", "[a,40]", "[b,15]"))
  }
  test("multi-aggregate global") {
    runCase(database + "sumcountavg_price(sum<Price>, count<Price>, avg<Price>) <- price(Price, _, _).",
      "sumcountavg_price(S, C, A).", data, Seq("[110,20,5.5]"))
  }
  test("multi-aggregate grouped") {
    runCase(database + "sumcountavg_price(ItemGroup, sum<Price>, count<Price>, avg<Price>) <- price(Price, _, ItemGroup).",
      "sumcountavg_price(ItemGroup, S, C, A).", data,
      Seq("[d,40,5,8.0]", "[c,15,5,3.0]", "[a,40,5,8.0]", "[b,15,5,3.0]"))
  }
  test("join of two aggregate groups with arithmetic") {
    val program = "avg_price_a_b_combined(N) <- avg_price(a,A), avg_price(b,B), N = A + B." +
      "avg_price(ItemGroup, avg<Price>) <- price(Price, _, ItemGroup)."
    runCase(database + program, "avg_price_a_b_combined(N).", data, Seq("[11.0]"))
  }
  test("countd over union (node count)") {
    val database2 = "database({arc(From:integer, To:integer)})."
    val program = "node(A) <- arc(A,_)." +
      "node(A) <- arc(_,A)." +
      "nodeCount(countd<A>) <- node(A)."
    runCase(database2 + program, "nodeCount(A)", Map("arc" -> Fixtures.graph1), Seq("[11]"))
  }
}

/** Mirrors NegationQuerySuite (NonRecursiveQuerySuites.scala:218-273). */
class NegationDatalogSpec extends DatalogSuite {
  val database = "database({" +
    "student(StudentId:integer, FirstName:string, LastName:string, GradeYear:integer)," +
    "course(Name:string, CourseId:integer, Units:integer)," +
    "taken(StudentId:integer, CourseId:integer, Grade:string)," +
    "enrolled(StudentId:integer, CourseId:integer)" +
    "})."
  val data = Map("student" -> Fixtures.student, "course" -> Fixtures.course,
    "taken" -> Fixtures.taken, "enrolled" -> Fixtures.enrolled)

  test("anti-join on base relations") {
    val db = "database({" +
      "employee(EmployeeId:integer, DepartmentId:integer, FirstName:string, LastName:string)," +
      "address(EmployeeId:integer, Street:string, City:string, State:string, Zip:integer)})."
    val program = "employee_missing_address(EmployeeID) <- employee(EmployeeID, _,_,_), ~address(EmployeeID, _,_,_,_)."
    runCase(db + program, "employee_missing_address(EmployeeId).",
      Map("employee" -> Fixtures.employee, "address" -> Fixtures.address),
      Seq("[3]"))
  }

  test("negation with bound constant") {
    val program = "cannot_graduate(FirstName, LastName) <- student(StudentId, FirstName, LastName, _), ~taken(StudentId, 100, _)."
    runCase(database + program, "cannot_graduate(FirstName,LastName).", data,
      Seq("[Fred,Flintstone]", "[Barney,Rubble]", "[Wilma,Flintstone]", "[Bam Bam,Rubble]"))
  }

  test("negation union with comments") {
    val program = "% can only take course 50 if you haven't already taken course 100\n" +
      "can_take_course_50(StudentId) <- student(StudentId, _, _, _), ~taken(StudentId, 100, _)." +
      " % can only take course 50 if you haven't already taken course 50\n" +
      "can_take_course_50(StudentId) <- student(StudentId, _, _, _), ~taken(StudentId, 50, _)."
    runCase(database + program, "can_take_course_50(StudentId)", data,
      Seq("[1000]", "[1001]", "[1004]", "[1005]"))
  }

  test("negation over aggregate-derived relation") {
    val program = "enrolled_units(StudentId, sum<Units>) <- enrolled(StudentId, CourseId), course(_, CourseId, Units)." +
      "exceeded_allowable_units(StudentId) <- enrolled_units(StudentId, N), N > 12." +
      "can_enroll(StudentId, CourseId) <- student(StudentId, _, _, _), course(_, CourseId, _), ~exceeded_allowable_units(StudentId), ~taken(StudentId, CourseId, _)."
    runCase(database + program, "can_enroll(StudentId, CourseId)", data,
      Seq("[1000,13]", "[1000,14]", "[1000,31]", "[1000,50]", "[1000,100]",
        "[1001,13]", "[1001,14]", "[1001,31]", "[1001,50]", "[1001,100]",
        "[1004,13]", "[1004,14]", "[1004,50]", "[1004,100]",
        "[1005,13]", "[1005,14]", "[1005,31]", "[1005,100]"))
  }
}

/** Mirrors TriangleQuerySuite (NonRecursiveQuerySuites.scala:275-319). */
class TriangleDatalogSpec extends DatalogSuite {
  val database = "database({arc(X:integer, Y:integer)})."

  test("triangle counting") {
    val program = "triangles(X,Y,Z) <- arc(X,Y),X < Y, arc(Y,Z), Y < Z, arc(Z,X)." +
      "triangle_count(count<_>) <- triangles(X,Y,Z)."
    runCase(database + program, "triangle_count(A)",
      Map("arc" -> Fixtures.trianglesGraph1), Seq("[0]"))
    runCase(database + program, "triangle_count(A)",
      Map("arc" -> Fixtures.trianglesGraph2), Seq("[1]"))
    runCase(database + program, "triangle_count(A)",
      Map("arc" -> Fixtures.trianglesGraph3), Seq("[4]"))
  }

  test("triangle closing (negation + count)") {
    val program = "uarc(X, Y) <- arc(X, Y)." +
      "uarc(Y, X) <- arc(X, Y)." +
      "triangle_closing(Y, Z, count<X>) <- uarc(X,Y), uarc(X,Z), Y ~= Z, ~uarc(Y,Z)."
    runCase(database + program, "triangle_closing(A,B,C)",
      Map("arc" -> Fixtures.trianglesGraph1), Seq("[0,2,1]", "[2,0,1]"))
    runCase(database + program, "triangle_closing(A,B,C)",
      Map("arc" -> Fixtures.trianglesGraph2), Seq())
    runCase(database + program, "triangle_closing(A,B,C)",
      Map("arc" -> Fixtures.trianglesGraph4),
      Seq("[1,2,2]", "[2,1,2]", "[0,3,2]", "[3,0,2]"))
  }

  test("PYMK (negation + count + sort + limit)") {
    val db = "database({" +
      "arc(X:integer, Y:integer)," +
      "pages(W1:integer, W2:integer, W3:integer, W4:integer, W5:integer, W6:integer, W7:integer, W8:integer, W9:integer)})."
    val program = "uarc(X, Y) <- arc(X, Y)." +
      "uarc(Y, X) <- arc(X, Y)." +
      "triangle_closing(Y, Z, count<X>) <- uarc(X,Y), uarc(X,Z), Y ~= Z, ~uarc(Y,Z)." +
      "pymk(X, W9) <- triangle_closing(X, 0, Z),pages(X, W2, W3, W4, W5, W6, W7, W8, W9), sort((Z, desc)), limit(10)."
    runCase(db + program, "pymk(A,B)",
      Map("arc" -> Fixtures.trianglesGraph5, "pages" -> Fixtures.pages),
      Seq("[4,4]", "[3,3]"))
  }
}
